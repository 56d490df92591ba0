"""Isolated attention-op timings at the bench ViT shape (S=62208, H=16, D=80).

Times ONLY the attention op in a scan (fixed q/k/v; output mixed into a carry so
nothing is DCE'd). Separates the attention cost from matmul/rope/norm noise in the
block-level probe. Also times rope and a bare einsum chain for reference.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.rope import apply_rotary, vision_rope_cos_sin
from zoomearth_tpu.models.vit import vision_metadata
from zoomearth_tpu.ops.attention import segment_attention_auto, window_block_attention

cfg = VLMConfig.qwen2_5_vl_3b()
vc = cfg.vision
HV, DV = vc.num_heads, vc.head_dim

grids = [(1, 36, 36)] * 48
n = sum(t * h * w for t, h, w in grids)
meta = vision_metadata(grids, vc, pad_to=n)
SV = n
N_IMG, L_IMG = 48, 1296
SEG_W = jnp.asarray(meta.seg_window)
SEG_F = jnp.asarray(meta.seg_full)
VCOS, VSIN = vision_rope_cos_sin(jnp.asarray(meta.pos_ids), vc.head_dim)
print(f"device: {jax.devices()[0]} S={SV}", file=sys.stderr)

# win2g plan (same as probe_vit_block)
seg_np = np.asarray(meta.seg_window)
runs, s = [], 0
for i in range(1, len(seg_np) + 1):
    if i == len(seg_np) or seg_np[i] != seg_np[s]:
        ln = i - s
        for off in range(0, ln, 64):
            runs.append((s + off, min(64, ln - off)))
        s = i
NW = len(runs)
gidx = np.zeros((NW, 64), np.int32)
gvalid = np.zeros((NW, 64), bool)
sidx = np.zeros((SV,), np.int32)
for w, (st, ln) in enumerate(runs):
    gidx[w, :ln] = np.arange(st, st + ln)
    gvalid[w, :ln] = True
    sidx[st : st + ln] = w * 64 + np.arange(ln)
GIDX, GVALID, SIDX = jnp.asarray(gidx.reshape(-1)), jnp.asarray(gvalid), jnp.asarray(sidx)


def win2g(q, k, v):
    qg = jnp.take(q, GIDX, axis=0).reshape(NW, 64, HV, DV)
    kg = jnp.take(k, GIDX, axis=0).reshape(NW, 64, HV, DV)
    vg = jnp.take(v, GIDX, axis=0).reshape(NW, 64, HV, DV)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qg, kg).astype(jnp.float32) * (DV**-0.5)
    logits = jnp.where(GVALID[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vg)
    return jnp.take(out.reshape(NW * 64, HV, DV), SIDX, axis=0)


def win2g_bf16(q, k, v):
    """Same but softmax compute in bf16 except the reduction (halves HBM traffic
    of the materialized probs)."""
    qg = jnp.take(q, GIDX, axis=0).reshape(NW, 64, HV, DV)
    kg = jnp.take(k, GIDX, axis=0).reshape(NW, 64, HV, DV)
    vg = jnp.take(v, GIDX, axis=0).reshape(NW, 64, HV, DV)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qg, kg).astype(jnp.float32) * (DV**-0.5)
    logits = jnp.where(GVALID[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vg)
    return jnp.take(out.reshape(NW * 64, HV, DV), SIDX, axis=0)


def dense8(q, k, v):
    qb = q.reshape(6, 8, L_IMG, HV, DV)
    kb = k.reshape(6, 8, L_IMG, HV, DV)
    vb = v.reshape(6, 8, L_IMG, HV, DV)

    def chunk(args):
        qc, kc, vc_ = args
        logits = jnp.einsum("bshd,bthd->bhst", qc, kc).astype(jnp.float32) * (DV**-0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhst,bthd->bshd", probs.astype(vc_.dtype), vc_)

    return jax.lax.map(chunk, (qb, kb, vb)).reshape(SV, HV, DV)


CASES = {
    "rope_qk": lambda q, k, v: apply_rotary(q, VCOS, VSIN) + apply_rotary(k, VCOS, VSIN),
    "flash_win": lambda q, k, v: segment_attention_auto(q, k, v, SEG_W),
    "win1": lambda q, k, v: window_block_attention(q, k, v, SEG_W, neighbors=True),
    "win2g": win2g,
    "win2g_bf16": win2g_bf16,
    "flash_full": lambda q, k, v: segment_attention_auto(q, k, v, SEG_F),
    "dense8_full": dense8,
}


def make(fn, nsteps):
    def f(q, k, v):
        def body(c, _):
            o = fn(q + c, k, v)  # q varies with carry: no hoisting
            return jnp.mean(o).astype(q.dtype) * 0.0, ()

        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=nsteps)
        return c

    return jax.jit(f)


def run(fn, args, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0) if best else time.time() - t0
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((SV, HV, DV)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((SV, HV, DV)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((SV, HV, DV)), jnp.bfloat16)
    N1, N2 = 4, 16
    f1, f2 = make(CASES["flash_win"], N1), make(CASES["flash_win"], N2)
    t1, t2 = run(f1, (q, k, v)), run(f2, (q, k, v))
    slope = (t2 - t1) / (N2 - N1)
    over = t1 - N1 * slope
    print(f"[flash_win] {slope*1e3:.2f} ms/op (overhead {over*1e3:.0f} ms)", flush=True)
    for name, fn in CASES.items():
        if name == "flash_win":
            continue
        t = run(make(fn, N2), (q, k, v))
        print(f"[{name}] {(t-over)/N2*1e3:.2f} ms/op", flush=True)


if __name__ == "__main__" and not __import__("os").environ.get("PROBE_BLOCKS"):
    main()


def main_blocks():
    from zoomearth_tpu.ops.flash_attention import flash_segment_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((SV, HV, DV)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((SV, HV, DV)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((SV, HV, DV)), jnp.bfloat16)
    N1, N2 = 4, 16
    base = lambda q, k, v: flash_segment_attention(q, k, v, SEG_W)
    f1, f2 = make(base, N1), make(base, N2)
    t1, t2 = run(f1, (q, k, v)), run(f2, (q, k, v))
    slope = (t2 - t1) / (N2 - N1)
    over = t1 - N1 * slope
    print(f"[win 256/256] {slope*1e3:.2f} ms/op (overhead {over*1e3:.0f} ms)", flush=True)
    for seg, tag in ((SEG_W, "win"), (SEG_F, "full")):
        for bq, bkv in ((256, 256), (512, 512), (1024, 512), (1024, 1024), (2048, 1024)):
            if tag == "win" and (bq, bkv) == (256, 256):
                continue
            fn = lambda q, k, v, seg=seg, bq=bq, bkv=bkv: flash_segment_attention(
                q, k, v, seg, block_q=bq, block_kv=bkv)
            t = run(make(fn, N2), (q, k, v))
            print(f"[{tag} {bq}/{bkv}] {(t-over)/N2*1e3:.2f} ms/op", flush=True)


import os
if os.environ.get("PROBE_BLOCKS") == "1":
    main_blocks()
    sys.exit(0)
