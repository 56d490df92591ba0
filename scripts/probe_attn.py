"""Probe: what is the floor for streaming the decode KV cache through Pallas?

(a) stream-only kernel: fetches the same (RB, Hkv, C, D) k/v blocks as flash_decode
    but does a trivial reduction — isolates the DMA pipeline floor.
(b) bigmm kernel: one (N*C, D) @ (D, N*G) matmul per chunk (block-diagonal extract)
    instead of N batched small matmuls — isolates matmul-issue overhead.

Run on TPU: python scripts/probe_attn.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
NEG_INF = -1e30


# ---------------- (a) stream-only ----------------
def _stream_kernel(q_ref, k_ref, v_ref, o_ref, acc):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    RB, Hkv, C, D = k_ref.shape
    acc[...] += (k_ref[...].reshape(RB * Hkv * C, D).astype(jnp.float32)[:64]
                 + v_ref[...].reshape(RB * Hkv * C, D).astype(jnp.float32)[:64])

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        RB, Hkv, G, D = o_ref.shape
        o_ref[...] = acc[...][: RB * Hkv * G].reshape(RB, Hkv, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "rb"))
def stream_only(q, k_cache, v_cache, kv_len, *, chunk=512, rb=4):
    B, H, D = q.shape[0], q.shape[2], q.shape[3]
    Hkv, T = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    NC = T // chunk
    qg = q[:, 0].reshape(B, Hkv, G, D)
    out = pl.pallas_call(
        _stream_kernel,
        grid=(B // rb, NC),
        in_specs=[
            pl.BlockSpec((rb, Hkv, G, D), lambda bb, c: (bb, 0, 0, 0)),
            pl.BlockSpec((rb, Hkv, chunk, D), lambda bb, c: (bb, 0, c, 0)),
            pl.BlockSpec((rb, Hkv, chunk, D), lambda bb, c: (bb, 0, c, 0)),
        ],
        out_specs=pl.BlockSpec((rb, Hkv, G, D), lambda bb, c: (bb, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((64, D), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
    )(qg, k_cache, v_cache)
    return out.reshape(B, 1, H, D)


# ---------------- (b) big-matmul attention ----------------
def _bigmm_kernel(ncb_ref, len_ref, qT_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, chunk, scale):
    bb = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(c < ncb_ref[bb])
    def _():
        _, D, NG = qT_ref.shape
        RB, Hkv, C, _ = k_ref.shape
        N = RB * Hkv
        G = NG // N
        kf = k_ref[...].reshape(N * C, D)
        # ONE matmul: every chunk token against every (row, g) query column
        big = jax.lax.dot_general(
            kf, qT_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N*C, N*G)
        big3 = big.reshape(N, C, NG)
        # diagonal block extract: logits (N, G, C)
        logits = jnp.stack([big3[n, :, n * G:(n + 1) * G].T for n in range(N)])
        pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        row_id = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) // Hkv
        bound = jnp.zeros_like(pos)
        for r in range(RB):
            bound = jnp.where(row_id == r, len_ref[bb * RB + r], bound)
        logits = jnp.where(pos < bound, logits, NEG_INF)
        m_prev = m_scr[...].reshape(N, G, 1)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(logits - m_new)  # (N, G, C)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[...].reshape(N, G, 1) * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # block-diagonal P (N*G, N*C) then ONE matmul against v (N*C, D):
        # tile p across column blocks and zero everything off the diagonal blocks
        pt = p.reshape(NG, C)
        tiled = jnp.concatenate([pt] * N, axis=1)  # (NG, N*C)
        ri = jax.lax.broadcasted_iota(jnp.int32, (NG, N * C), 0) // G
        ci = jax.lax.broadcasted_iota(jnp.int32, (NG, N * C), 1) // C
        pbig = jnp.where(ri == ci, tiled, 0.0)
        vf = v_ref[...].reshape(N * C, D)
        pv = jax.lax.dot_general(
            pbig.astype(vf.dtype), vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N*G, D)
        acc_scr[...] = acc_scr[...] * alpha.reshape(NG, 1) + pv
        m_scr[...] = m_new.reshape(NG, 1)
        l_scr[...] = l_new.reshape(NG, 1)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        RB, Hkv, G, D = o_ref.shape
        out = acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)
        o_ref[...] = out.reshape(RB, Hkv, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def bigmm_decode_attention(q, k_cache, v_cache, kv_len, *, chunk=512, interpret=False):
    had_s = q.ndim == 4
    if had_s:
        q = q[:, 0]
    B, H, D = q.shape
    Hkv, T = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    RB = next(r for r in (4, 2, 1) if B % r == 0)
    N = RB * Hkv
    NC = T // chunk
    scale = D**-0.5
    kv_len = jnp.clip(kv_len.astype(jnp.int32), 0, T)
    n_chunks = jnp.maximum((kv_len + chunk - 1) // chunk, 1)
    ncb = jnp.max(n_chunks.reshape(B // RB, RB), axis=1)
    # qT: (B//RB, D, N*G) — per-row-block transposed queries, columns ordered (b, hkv, g)
    qT = q.reshape(B // RB, N * G, D).transpose(0, 2, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // RB, NC),
        in_specs=[
            pl.BlockSpec((1, D, N * G), lambda bb, c, ncb, ln: (bb, 0, 0)),
            pl.BlockSpec((RB, Hkv, chunk, D), lambda bb, c, ncb, ln: (bb, 0, jnp.minimum(c, ncb[bb] - 1), 0)),
            pl.BlockSpec((RB, Hkv, chunk, D), lambda bb, c, ncb, ln: (bb, 0, jnp.minimum(c, ncb[bb] - 1), 0)),
        ],
        out_specs=pl.BlockSpec((RB, Hkv, G, D), lambda bb, c, ncb, ln: (bb, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((N * G, 1), jnp.float32),
            pltpu.VMEM((N * G, 1), jnp.float32),
            pltpu.VMEM((N * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_bigmm_kernel, chunk=chunk, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(ncb, kv_len, qT, k_cache, v_cache)
    return out.reshape(B, H, D)[:, None] if had_s else out.reshape(B, H, D)


def main():
    from zoomearth_tpu.ops.attention import decode_attention
    from zoomearth_tpu.ops.flash_decode import flash_decode_attention

    rng = np.random.default_rng(0)
    B, H, Hkv, D, T = 32, 16, 2, 128, 1536
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(600, 1200, size=B), jnp.int32)

    ref = np.asarray(decode_attention(q, k, v, kv_len=lens), np.float32)
    out = np.asarray(bigmm_decode_attention(q, k, v, lens, chunk=512), np.float32)
    print("bigmm parity max|d|:", np.abs(ref - out).max())

    def many(fn):
        def run(q, k, v, lens):
            def body(carry, _):
                o = fn(carry, k, v, lens)
                return carry + 0.0 * o, o.reshape(-1)[0].astype(jnp.float32)
            _, outs = jax.lax.scan(body, q, None, length=200)
            return outs
        return jax.jit(run)

    full = jnp.full((B,), T, jnp.int32)
    cases = [
        ("stream_only(DMA floor)", lambda q_, k_, v_, l_: stream_only(q_, k_, v_, l_), full),
        ("bigmm512 len600-1200", lambda q_, k_, v_, l_: bigmm_decode_attention(q_, k_, v_, l_, chunk=512), lens),
        ("bigmm512 len=T", lambda q_, k_, v_, l_: bigmm_decode_attention(q_, k_, v_, l_, chunk=512), full),
    ]
    for name, fn, l in cases:
        r = many(fn)
        _ = np.asarray(r(q, k, v, l))
        t0 = time.time(); _ = np.asarray(r(q, k, v, l)); dt = time.time() - t0
        print(f"{name}: {dt/200*1e3:.4f} ms/call ({dt/200*1e3*36:.2f} ms/36-layer)")


if __name__ == "__main__":
    main()
