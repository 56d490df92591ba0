"""A/B the full ViT tower on TPU: flash segment kernel vs dense windowed attention.

Shape = the bench's stage-2 crop tower at batch 48: 48 x (1,36,36) grids = 62208
patches padded (mode 1, edge windows) and 48 x (1,32,32) = 49152 (mode 2, uniform).
Times the jitted vit_forward end-to-end (includes patch embed, perm, merger) with a
blocking readback; best of 3.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.vit import vision_metadata, vit_forward
from __graft_entry__ import _zero_params

cfg = VLMConfig.qwen2_5_vl_3b()
vc = cfg.vision
params = _zero_params(cfg, jnp.bfloat16)["vision"]
print(f"device: {jax.devices()[0]}", file=sys.stderr)


def run_case(name, grids, win_mode):
    n = sum(t * h * w for t, h, w in grids)
    pad_to = -(-n // 256) * 256
    meta = vision_metadata(grids, vc, pad_to=pad_to)
    assert meta.win_mode == win_mode or win_mode == 0, (meta.win_mode, win_mode)
    pv = jnp.zeros((pad_to, vc.patch_dim), jnp.bfloat16)
    args = (params, pv, jnp.asarray(meta.perm), jnp.asarray(meta.inv_perm_merged),
            jnp.asarray(meta.seg_window), jnp.asarray(meta.seg_full),
            jnp.asarray(meta.pos_ids))
    fn = jax.jit(lambda p, *a: vit_forward(p, vc, *a, win_mode=win_mode))
    t0 = time.time()
    np.asarray(fn(*args))
    print(f"[{name}] S={pad_to} compile+first: {time.time()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(*args))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"[{name}] S={pad_to} best: {best*1e3:.1f} ms", flush=True)
    return best


# bench stage-2 shape: 48 crops of 504px -> (1,36,36)
grids36 = [(1, 36, 36)] * 48
run_case("36x36 flash (win_mode=0)", grids36, 0)
run_case("36x36 windowed (mode 1)", grids36, 1)
# exact-512 crops: (1,32,32), uniform windows
grids32 = [(1, 32, 32)] * 48
run_case("32x32 flash (win_mode=0)", grids32, 0)
run_case("32x32 uniform (mode 2)", grids32, 2)
