"""Multi-host initialization: jax.distributed wrapper (SURVEY.md §2.3 "multi-node").

The reference's multi-node story is torchrun scaffolding only (train_grpo.sh:34-36,
empty multinode_training_demo.sh). TPU-native: `initialize()` joins the jax.distributed
cluster (env-driven on Cloud TPU; explicit args elsewhere), and `make_global_mesh`
builds a (data, fsdp, tensor) mesh over ALL hosts' devices with the data axis spanning
hosts (collectives on data ride DCN, fsdp/tensor stay intra-slice on ICI).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join the multi-host cluster. No-ops on single-process runs.

    On Cloud TPU pods jax.distributed.initialize() self-configures from the
    environment; the explicit args mirror torchrun's --master_addr/--nnodes/--node_rank
    (train_grpo.sh:34-36) for non-TPU fabrics."""
    if num_processes in (None, 1) and coordinator_address is None and "COORDINATOR_ADDRESS" not in os.environ:
        try:
            n = jax.process_count()
        except RuntimeError:
            n = 1
        if n == 1 and num_processes in (None, 1):
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh(fsdp: int = 1, tensor: int = 1):
    """(data, fsdp, tensor) mesh over all hosts' devices; data absorbs the rest.

    fsdp*tensor should divide jax.local_device_count() so those axes stay on ICI."""
    local = jax.local_device_count()
    if fsdp * tensor > local:
        raise ValueError(
            f"fsdp*tensor ({fsdp * tensor}) exceeds local devices ({local}); "
            "those axes must not cross hosts (they would put layer collectives on DCN)"
        )
    return make_mesh(data=-1, fsdp=fsdp, tensor=tensor, devices=jax.devices())


def global_put(tree, shardings):
    """Put a host-replicated pytree onto global shardings, across processes.

    Multi-controller jax.device_put cannot target shardings that span
    non-addressable devices; here every process holds the FULL logical value
    (deterministic construction from a shared seed/data) and contributes only its
    addressable shards via make_array_from_callback. Works unchanged in
    single-process runs."""
    import numpy as np

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
