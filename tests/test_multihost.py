"""Multi-PROCESS distributed test: two CPU processes form one jax.distributed cluster
and run a psum over a global (data, fsdp) mesh through parallel.multihost.

This exercises the cross-host path the reference never tested (its multi-node story is
torchrun scaffolding + an empty demo script, SURVEY.md §2.3): process boundaries, the
global mesh with data spanning processes, and a collective crossing them."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from zoomearth_tpu.parallel.multihost import initialize, make_global_mesh, process_info

pid = int(sys.argv[1])
initialize(coordinator_address=os.environ["COORD"], num_processes=2, process_id=pid)
info = process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info  # 4 local x 2 processes

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_global_mesh(fsdp=2)  # data=4 spans BOTH processes, fsdp=2 intra-process
assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "tensor": 1}, dict(mesh.shape)

# global array sharded over data: each process contributes its local shards
x = jax.make_array_from_callback(
    (8, 4), NamedSharding(mesh, P("data", None)),
    lambda idx: np.ones((8, 4), np.float32)[idx] * (pid + 1),
)

@jax.jit
def total(x):
    return jnp.sum(x)  # all-reduce across both processes

t = float(total(x))
# rows 0-3 live on process 0 (value 1), rows 4-7 on process 1 (value 2): 4*4*1 + 4*4*2
assert t == 48.0, t
print(f"proc {pid}: psum over 2 processes OK, total={t}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("ZOOMEARTH_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["COORD"] = f"127.0.0.1:{port}"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_NUM_CPU_DEVICES"] = "4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "psum over 2 processes OK" in out
