"""Device mesh construction + sharding rules for the data/fsdp/tensor axes.

TPU-native replacement for the reference's distributed substrate (torchrun DP,
DeepSpeed ZeRO-2/3 — SURVEY.md §2.3): a single `jax.sharding.Mesh` with axes

- ``data``   — batch (DP; reference torchrun --nproc_per_node, train_grpo.sh:33-38)
- ``fsdp``   — parameter/optimizer sharding (ZeRO-3 equivalent; XLA gathers shards
               inside the jitted program, so the reference's zero-3 generation monkey
               patch, qwen2_5vl_monkey_patch.py:51-213, has no analogue here)
- ``tensor`` — megatron-style intra-layer sharding (absent in the reference at 3B;
               designed-in per SURVEY.md §2.3)

Collectives ride ICI inside a slice; multi-host meshes put ``data`` on DCN.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor")


def make_mesh(
    data: int = -1, fsdp: int = 1, tensor: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, fsdp, tensor) mesh. data=-1 absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor) == 0, f"{n} devices not divisible by fsdp*tensor={fsdp * tensor}"
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, AXES)


# ---------------------------------------------------------------------------
# Param sharding rules (path-regex -> PartitionSpec)
# ---------------------------------------------------------------------------

# Megatron-style layout: column-parallel (out dim on tensor) for qkv/gate/up,
# row-parallel (in dim on tensor) for o/down; the other matmul dim shards on fsdp
# (ZeRO-3 style). Norm scales and small biases stay replicated on fsdp but biases of
# column-parallel layers follow their matrix's tensor split.
DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    # text decoder
    (r"text/layers/\d+/attn/w[qkv]$", P("fsdp", "tensor")),
    (r"text/layers/\d+/attn/b[qkv]$", P("tensor")),
    (r"text/layers/\d+/attn/wo$", P("tensor", "fsdp")),
    (r"text/layers/\d+/mlp/w[gu]$", P("fsdp", "tensor")),
    (r"text/layers/\d+/mlp/wd$", P("tensor", "fsdp")),
    (r"text/(embed|lm_head)/weight$", P("fsdp", None)),
    # vision tower
    (r"vision/blocks/\d+/attn/wqkv$", P("fsdp", "tensor")),
    (r"vision/blocks/\d+/attn/bqkv$", P("tensor")),
    (r"vision/blocks/\d+/attn/wo$", P("tensor", "fsdp")),
    (r"vision/blocks/\d+/mlp/w[gu]$", P("fsdp", "tensor")),
    (r"vision/blocks/\d+/mlp/wd$", P("tensor", "fsdp")),
    (r"vision/merger/w0$", P("fsdp", "tensor")),
    (r"vision/merger/w1$", P("tensor", "fsdp")),
    (r"vision/patch_embed/kernel$", P(None, "fsdp")),
    # everything else (norm scales, small biases): replicated
    (r".*", P()),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_fits(spec: P, shape, mesh: Mesh) -> bool:
    """A spec only applies if every sharded dim divides evenly by its axis size."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim >= len(shape) or shape[dim] % size != 0:
            return False
    return True


def param_shardings(params, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Param tree -> matching NamedSharding tree (first rule whose regex matches the
    path AND whose spec divides the shape; falls back to replicated)."""

    def assign(path, leaf):
        s = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, s) and _spec_fits(spec, leaf.shape, mesh):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Place a (host or single-device) param tree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, *leading_batch_axes: int):
    """NamedSharding for batch arrays: dim 0 on 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))
