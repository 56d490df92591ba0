"""Probe: gen2 chunk-prefill cost at the wave-bench shape (B=64, S=384, T=1536).

BENCH r4 instrumentation: chunk_prefill measures 3.37 s/wave — 5x the ~0.66 s MXU
FLOPs floor. Suspect: the XLA masked-attention path materializes (B, Hkv, G, S, T)
fp32 logits (~2.4 GB/layer). Compare per-layer-equivalents in a scan:

  xla    causal_attention (kv_positions/valid mask, the current use_flash=False path)
  flash  flash_causal_attention (Pallas streaming kernel, bf16)

Both at q (B, S, H, D) vs cache (B, Hkv, T, D), queries at positions keep+iota,
kv_len = keep + S (the continuation-chunk geometry). Scan-slope timed.

Run on TPU: python scripts/probe_chunk_prefill.py
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from zoomearth_tpu.ops.attention import causal_attention
from zoomearth_tpu.ops.flash_causal import flash_causal_attention

B, S, H, Hkv, D, T = 64, 384, 16, 2, 128, 1536
KEEP = 860  # stage-1 prompt + completion already in cache


def build_loop(variant, n_steps):
    positions = jnp.broadcast_to(KEEP + jnp.arange(S)[None], (B, S))
    kv_len = jnp.full((B,), KEEP + S, jnp.int32)
    slot = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    valid = slot < kv_len[:, None]

    def loop(q0, k_cache, v_cache):
        def body(carry, _):
            q, k_cache, v_cache = carry
            if variant == "xla":
                out = causal_attention(
                    q, k_cache, v_cache, positions=positions,
                    kv_positions=slot, valid=valid,
                )
            else:
                out = flash_causal_attention(
                    q, k_cache, v_cache, positions, kv_len,
                )
            # keep cache live (one row written) and q dependent on out
            k_cache = k_cache.at[:, :, KEEP, :].set(out[:, 0, :Hkv, :].astype(k_cache.dtype))
            v_cache = v_cache.at[:, :, KEEP, :].set(out[:, 0, :Hkv, :].astype(v_cache.dtype))
            q = q + out * 1e-6
            return (q, k_cache, v_cache), out[0, 0, 0, 0]

        (_, k_cache, v_cache), tr = jax.lax.scan(body, (q0, k_cache, v_cache), None, length=n_steps)
        return tr

    return jax.jit(loop, donate_argnums=(1, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--variants", default="xla,flash")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}  shape B={B} S={S} T={T} keep={KEEP}", file=sys.stderr)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    def fresh():
        k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
        return k, v

    for variant in args.variants.split(","):
        n_short, n_long = args.steps, 3 * args.steps
        loops = {n: build_loop(variant, n) for n in (n_short, n_long)}
        t0 = time.time()
        for n, loop in loops.items():
            np.asarray(loop(q0, *fresh()))
        compile_s = time.time() - t0
        t_at = {}
        for n, loop in loops.items():
            ts = []
            for _ in range(args.reps):
                a = fresh()
                np.asarray(a[0][0, 0, 0, 0])
                t0 = time.time()
                np.asarray(loop(q0, *a))
                ts.append(time.time() - t0)
            t_at[n] = min(ts)
        ms = (t_at[n_long] - t_at[n_short]) / (n_long - n_short) * 1000
        print(f"{variant:6s}: {ms:8.3f} ms/layer-call x36 = {ms * 36 / 1000:.2f}s/pass "
              f"(slope {n_short}->{n_long}; compile {compile_s:.0f}s; "
              f"t{n_short}={t_at[n_short]:.3f}s t{n_long}={t_at[n_long]:.3f}s)")


if __name__ == "__main__":
    main()
