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

# ---- one FULL sharded SFT train step over the global mesh (vision + decoder +
# masked loss + AdamW), data axis spanning both processes. The pytest harness runs
# the IDENTICAL step single-process on an 8-device mesh and asserts loss parity.
import functools
import __graft_entry__
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.parallel.mesh import param_shardings
from zoomearth_tpu.parallel.multihost import global_put
from zoomearth_tpu.train.sft import SFTConfig, make_optimizer, train_step

cfg = VLMConfig.tiny()
params = init_vlm_params(jax.random.key(0), cfg)  # same seed -> same full value everywhere
p_shard = param_shardings(params, mesh)
params = global_put(params, p_shard)
tx = make_optimizer(SFTConfig(warmup_steps=1, total_steps=10))
opt_state = jax.jit(tx.init)(params)
ids, pos, pv, meta = __graft_entry__._example_inputs(cfg, batch=8, seq=128, grid=(1, 8, 8), patch_bucket=0)
labels = np.where(ids == cfg.tokens.pad, -100, ids)
batch_dict = global_put(
    {"input_ids": ids, "labels": labels, "position_ids": pos, "pixel_values": pv,
     "vision_meta": meta},
    {"input_ids": NamedSharding(mesh, P("data", None)),
     "labels": NamedSharding(mesh, P("data", None)),
     "position_ids": NamedSharding(mesh, P(None, "data", None)),
     "pixel_values": NamedSharding(mesh, P("data", None)),
     "vision_meta": {k: NamedSharding(mesh, P()) for k in meta}},
)
step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
_, _, metrics = step(params, opt_state, batch_dict)
loss = float(metrics["loss"])  # replicated scalar: addressable on every process
print(f"proc {pid}: SFT step across 2 processes OK, loss={loss:.6f}", flush=True)
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
        assert "SFT step across 2 processes OK" in out

    # loss parity: the IDENTICAL step single-process over this pytest process's own
    # 8-device mesh (conftest forces 8 CPU devices) must agree with the 2-process run
    import re

    cluster_losses = {
        float(m.group(1)) for out in outs
        for m in re.finditer(r"loss=([0-9.]+)", out)
    }
    assert len(cluster_losses) == 1, f"processes disagree: {cluster_losses}"
    expected = _single_process_loss()
    got = cluster_losses.pop()
    assert abs(got - expected) < 1e-4 * max(1.0, abs(expected)), (got, expected)


def _single_process_loss():
    """Same global mesh shape ({'data': 4, 'fsdp': 2}), same seed/data, one process."""
    import functools

    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__
    from zoomearth_tpu.config import VLMConfig
    from zoomearth_tpu.models.params import init_vlm_params
    from zoomearth_tpu.parallel.mesh import make_mesh, param_shardings
    from zoomearth_tpu.parallel.multihost import global_put
    from zoomearth_tpu.train.sft import SFTConfig, make_optimizer, train_step

    mesh = make_mesh(data=-1, fsdp=2, tensor=1, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "tensor": 1}
    cfg = VLMConfig.tiny()
    params = init_vlm_params(jax.random.key(0), cfg)
    params = global_put(params, param_shardings(params, mesh))
    tx = make_optimizer(SFTConfig(warmup_steps=1, total_steps=10))
    opt_state = jax.jit(tx.init)(params)
    ids, pos, pv, meta = __graft_entry__._example_inputs(
        cfg, batch=8, seq=128, grid=(1, 8, 8), patch_bucket=0
    )
    labels = np.where(ids == cfg.tokens.pad, -100, ids)
    batch_dict = global_put(
        {"input_ids": ids, "labels": labels, "position_ids": pos, "pixel_values": pv,
         "vision_meta": meta},
        {"input_ids": NamedSharding(mesh, P("data", None)),
         "labels": NamedSharding(mesh, P("data", None)),
         "position_ids": NamedSharding(mesh, P(None, "data", None)),
         "pixel_values": NamedSharding(mesh, P("data", None)),
         "vision_meta": {k: NamedSharding(mesh, P()) for k in meta}},
    )
    step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
    _, _, metrics = step(params, opt_state, batch_dict)
    return float(metrics["loss"])
