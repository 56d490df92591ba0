"""Probe: can XLA stream the int8 KV cache in DECODE attention without a
materialized bf16 convert?

Context (BASELINE.md r3/r4): full-model decode at B=64/T=1536 measures 14.8 ms/step
with a bf16 cache, 21.4 ms with the int8 cache through decode_attention_q8 (XLA
materializes a bf16 copy of the cache every step: 1.8 GB int8 read + 3.6 GB write +
3.6 GB read back ~= +6.5 ms), and 24.4 ms through the Pallas int8 decode kernel
(pallas_call blocks XLA's cross-op overlap — same reason the bf16 kernel loses).

This isolates the attention op in a realistic scan (cache is a live carry: one token
written per step, so the convert cannot be hoisted) and compares:
  bf16   decode_attention on a bf16 cache (reference floor)
  q8_v0  decode_attention_q8 as-is (int8 fed straight into dot_general)
  q8_v1  same algebra, explicit .astype(bf16) on the int8 values inside the dot —
         gives XLA a convert it can fuse into the dot's operand stream
  q8_v2  scales folded into the VALUES before the dots (dequant-multiply) — the
         upper bound on materialization cost

Run on TPU: python scripts/probe_q8_decode.py [--steps 25] [--reps 2]
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from zoomearth_tpu.ops.attention import NEG_INF, decode_attention, decode_attention_q8

B, H, Hkv, D, T = 64, 16, 2, 128, 1536
G = H // Hkv
SCALE = D**-0.5


def q8_attn_cast(q, k_cache, v_cache, ks, vs, kv_len):
    """decode_attention_q8 algebra with explicit bf16 casts inside the dots."""
    qg = q[:, 0].reshape(B, Hkv, G, D).astype(jnp.bfloat16)
    logits = jax.lax.dot_general(
        qg, k_cache.astype(jnp.bfloat16), (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    logits = logits * ks.astype(jnp.float32)[:, :, None, :] * SCALE
    valid = jnp.arange(T)[None, :] < kv_len[:, None]
    logits = jnp.where(valid[:, None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    p = (p * vs.astype(jnp.float32)[:, :, None, :]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        p, v_cache.astype(jnp.bfloat16), (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(B, 1, H, D)


def q8_attn_dequant(q, k_cache, v_cache, ks, vs, kv_len):
    """Scales folded into values (full dequant) — materialization upper bound."""
    k = k_cache.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
    v = v_cache.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
    return decode_attention(q, k, v, kv_len=kv_len)


def build_loop(variant, n_steps):
    quant = variant != "bf16"

    def loop(k_cache, v_cache, ks, vs, q0, kv_len):
        def body(carry, _):
            k_cache, v_cache, ks, vs, q, kv_len = carry
            if variant == "bf16":
                out = decode_attention(q, k_cache, v_cache, kv_len=kv_len)
            elif variant == "q8_v0":
                out = decode_attention_q8(q, k_cache, v_cache, ks, vs, kv_len=kv_len)
            elif variant == "q8_v1":
                out = q8_attn_cast(q, k_cache, v_cache, ks, vs, kv_len)
            else:
                out = q8_attn_dequant(q, k_cache, v_cache, ks, vs, kv_len)
            # write the "new token's" kv at kv_len (cache stays a LIVE carry: the
            # bf16 convert of the int8 cache cannot be hoisted out of the scan)
            newkv = out[:, 0, :Hkv, :]  # (B, Hkv, D)
            bidx = jnp.arange(B)[:, None]
            wpos = kv_len[:, None]
            k_cache = k_cache.at[bidx, :, wpos, :].set(
                newkv[:, None].astype(k_cache.dtype), mode="drop")
            v_cache = v_cache.at[bidx, :, wpos, :].set(
                newkv[:, None].astype(v_cache.dtype), mode="drop")
            if quant:
                s = jnp.maximum(jnp.max(jnp.abs(newkv), -1), 1e-6).astype(jnp.bfloat16)
                ks = ks.at[bidx, :, wpos].set(s[:, None], mode="drop")
                vs = vs.at[bidx, :, wpos].set(s[:, None], mode="drop")
            # q depends on out: the chain is sequential
            q = q + out * 1e-6
            return (k_cache, v_cache, ks, vs, q, kv_len + 1), out[:, 0, 0, 0]

        carry = (k_cache, v_cache, ks, vs, q0, kv_len)
        _, tr = jax.lax.scan(body, carry, None, length=n_steps)
        return tr

    return jax.jit(loop, donate_argnums=(0, 1, 2, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--variants", default="bf16,q8_v0,q8_v1")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    kv_len0 = jnp.full((B,), 700, jnp.int32)

    for variant in args.variants.split(","):
        quant = variant != "bf16"

        def fresh():
            if quant:
                k = jnp.asarray(rng.integers(-127, 128, (B, Hkv, T, D)), jnp.int8)
                v = jnp.asarray(rng.integers(-127, 128, (B, Hkv, T, D)), jnp.int8)
                ks = jnp.asarray(rng.uniform(0.005, 0.03, (B, Hkv, T)), jnp.bfloat16)
                vs = jnp.asarray(rng.uniform(0.005, 0.03, (B, Hkv, T)), jnp.bfloat16)
            else:
                k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
                v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
                ks = jnp.zeros((1, 1, 1), jnp.bfloat16)
                vs = ks
            return k, v, ks, vs

        n_short, n_long = args.steps, 3 * args.steps
        loops = {n: build_loop(variant, n) for n in (n_short, n_long)}
        t0 = time.time()
        for n, loop in loops.items():
            np.asarray(loop(*fresh(), q0, kv_len0))
        compile_s = time.time() - t0
        t_at = {}
        for n, loop in loops.items():
            ts = []
            for _ in range(args.reps):
                a = fresh()
                np.asarray(a[0][0, 0, 0, 0])
                t0 = time.time()
                np.asarray(loop(*a, q0, kv_len0))
                ts.append(time.time() - t0)
            t_at[n] = min(ts)
        ms = (t_at[n_long] - t_at[n_short]) / (n_long - n_short) * 1000
        print(f"{variant:10s}: {ms:7.3f} ms/step  (slope {n_short}->{n_long}; "
              f"compile {compile_s:.0f}s; t{n_short}={t_at[n_short]:.3f}s "
              f"t{n_long}={t_at[n_long]:.3f}s)")


if __name__ == "__main__":
    main()
