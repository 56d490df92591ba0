"""One-off profiling: where does the 20k-patch ViT pass spend its time? (round-2)"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.vit import vit_forward, vision_metadata
from zoomearth_tpu.ops.flash_attention import flash_segment_attention
from __graft_entry__ import _zero_params

cfg = VLMConfig.qwen2_5_vl_3b()
vc = cfg.vision
print("device:", jax.devices()[0], file=sys.stderr)
params = _zero_params(cfg, jnp.bfloat16)

# 16 images of 36x36 patches = 20736 patches (the bench stage-1 shape)
grids = [(1, 36, 36)] * 16
P = 20736
meta = vision_metadata(grids, vc, pad_to=0)
pv = np.random.default_rng(0).standard_normal((P, vc.patch_dim)).astype(np.float32)
margs = {k: jnp.asarray(getattr(meta, k)) for k in
         ("perm", "inv_perm_merged", "seg_window", "seg_full", "pos_ids")}

vf = jax.jit(lambda p, pv, m: vit_forward(p["vision"], vc, pv, m["perm"], m["inv_perm_merged"],
                                          m["seg_window"], m["seg_full"], m["pos_ids"]))
pvj = jnp.asarray(pv)

t0 = time.time(); out = vf(params, pvj, margs); jax.block_until_ready(out)
print(f"vit compile+run: {time.time()-t0:.2f}s")
for _ in range(3):
    t0 = time.time(); out = vf(params, pvj, margs); jax.block_until_ready(out)
    print(f"vit forward 20736 patches: {(time.time()-t0)*1e3:.0f} ms")

# isolate the flash kernel: 16 heads, head_dim 80, window segs
H, D = vc.num_heads, vc.head_dim
q = jnp.asarray(np.random.default_rng(1).standard_normal((P, H, D)), jnp.bfloat16)
seg_w = jnp.asarray(meta.seg_window)
seg_f = jnp.asarray(meta.seg_full)
fa = jax.jit(lambda q, s: flash_segment_attention(q, q, q, s))
t0 = time.time(); o = fa(q, seg_w); jax.block_until_ready(o)
print(f"flash window compile+run: {time.time()-t0:.2f}s")
for _ in range(3):
    t0 = time.time(); o = fa(q, seg_w); jax.block_until_ready(o)
    print(f"flash attn window-seg: {(time.time()-t0)*1e3:.1f} ms")
t0 = time.time(); o = fa(q, seg_f); jax.block_until_ready(o)
print(f"flash full compile+run: {time.time()-t0:.2f}s")
for _ in range(3):
    t0 = time.time(); o = fa(q, seg_f); jax.block_until_ready(o)
    print(f"flash attn full-seg: {(time.time()-t0)*1e3:.1f} ms")

# patch-embed + merger only (no blocks): bound the non-block overhead
def stem(p, pv, m):
    x = pv.astype(p["vision"]["patch_embed"]["kernel"].dtype) @ p["vision"]["patch_embed"]["kernel"]
    return jnp.take(x, m["perm"], axis=0)
st = jax.jit(stem)
o = st(params, pvj, margs); jax.block_until_ready(o)
for _ in range(2):
    t0 = time.time(); o = st(params, pvj, margs); jax.block_until_ready(o)
    print(f"patch_embed+perm: {(time.time()-t0)*1e3:.1f} ms")
