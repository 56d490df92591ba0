"""Decode-step ablation: where do the milliseconds go?

Times a jitted N-step decode scan (same shape as serve/engine._decode_steps) under
ablations, on the real TPU. Measurements drive the VERDICT r2 item-2 work (fused decode
step): BASELINE.md records 12.8 ms/step at B=32/T=1536 int8 vs a ~6.6-8.7 ms bandwidth
bound, and a superlinear B=16 -> B=32 jump that points at the attention/cache path.

Ablations (--mode):
  full      normal decode step (embed -> 36 layers -> logits -> sample)
  noattn    decode_attention replaced by zeros_like(q-out): isolates the weight-matmul
            floor (QKV/O/MLP/logits reads) + cache writes
  nologits  logits head replaced by a cheap slice: isolates the lm_head read (~622 MB)
  nosample  greedy only, no categorical

Sweeps: --batch 16,32,48  --ctx 512,1536  --steps 50  --dtype int8|bf16

Usage: python scripts/profile_decode.py --batch 16,32 --ctx 1536 --mode full,noattn
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build_step_loop(params, cfg, B, T, n_steps, mode):
    from zoomearth_tpu.models import decoder as dec
    from zoomearth_tpu.models.vlm import vlm_forward

    pad_id = cfg.tokens.pad

    def loop(params, cache, cur_tokens, next_pos, key):
        def body(carry, _):
            cache, cur, pos, key = carry
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            logits, cache = vlm_forward(
                params, cfg, cur[:, None], pos3,
                attn_positions=cache.length[:, None], cache=cache,
            )
            logits = logits[:, 0]
            if mode == "nosample":
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                # keep the sampling chain LIVE (a constant-pred where() would let XLA
                # DCE the categorical, making full == nosample by construction)
                key, sub = jax.random.split(key)
                tok = jax.random.categorical(sub, logits / 0.7, axis=-1).astype(jnp.int32)
            return (cache, tok, pos + 1, key), tok

        (cache, cur, pos, key), toks = jax.lax.scan(
            body, (cache, cur_tokens, next_pos, key), None, length=n_steps
        )
        return toks

    return jax.jit(loop, donate_argnums=(1,))


def patch_mode(mode, cfg):
    """Monkeypatch ablations into the decoder module (restore not needed: one mode per
    process run when comparing; in-process sweeps re-patch)."""
    from zoomearth_tpu.models import decoder as dec
    from zoomearth_tpu.models import vlm

    if not hasattr(dec, "_orig_decode_attention"):
        dec._orig_decode_attention = dec.decode_attention
        vlm._orig_logits = getattr(vlm, "logits_from_hidden", None)

    if mode == "noattn":
        def fake_attn(q, k_cache, v_cache, *, kv_len, scale=None):
            return jnp.zeros_like(q)
        dec.decode_attention = fake_attn
    else:
        dec.decode_attention = dec._orig_decode_attention

    import zoomearth_tpu.models.vlm as vlm_mod
    from zoomearth_tpu.models.decoder import logits_from_hidden as real_logits

    if mode == "nologits":
        def fake_logits(params, tcfg, hidden):
            # cheap stand-in with the right output shape: no lm_head weight read
            B, S, _ = hidden.shape
            return jnp.broadcast_to(
                hidden[..., :1].astype(jnp.float32), (B, S, tcfg.vocab_size)
            )
        vlm_mod.logits_from_hidden = fake_logits
    else:
        vlm_mod.logits_from_hidden = real_logits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default="16,32")
    ap.add_argument("--ctx", default="1536")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--mode", default="full")
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--kv", default="bf16", help="KV cache dtype: bf16|int8")
    ap.add_argument("--fuse", action="store_true", help="fuse_decoder_matmuls layout")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from zoomearth_tpu.config import VLMConfig
    from zoomearth_tpu.models.decoder import KVCache
    from __graft_entry__ import _zero_params

    cfg = VLMConfig.qwen2_5_vl_3b()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    params = _zero_params(cfg, jnp.bfloat16)
    if args.fuse:
        from zoomearth_tpu.ops.quant import fuse_decoder_matmuls
        params = fuse_decoder_matmuls(params)
    if args.dtype == "int8":
        from zoomearth_tpu.ops.quant import quantize_decoder_int8
        params = quantize_decoder_int8(params)

    results = []
    for mode in args.mode.split(","):
        patch_mode(mode, cfg)
        for B in map(int, args.batch.split(",")):
            for T in map(int, args.ctx.split(",")):
                # SCAN-LENGTH SLOPE timing: per-call dispatch (~0.3-0.7 s) and readback
                # (~1 s) through the axon tunnel swamp a single scan; (t_long - t_short)
                # / (n_long - n_short) cancels the fixed costs.
                n_short, n_long = args.steps, 3 * args.steps
                cur = jnp.full((B,), 1000, jnp.int32)
                pos = jnp.full((B,), 700, jnp.int32)
                key = jax.random.key(0)

                kv_dtype = jnp.int8 if args.kv == "int8" else jnp.bfloat16

                def fresh_cache():
                    c = KVCache.create(cfg.text, B, T, kv_dtype)
                    return c._replace(length=jnp.full((B,), 700, jnp.int32))

                t0 = time.time()
                loops = {n: build_step_loop(params, cfg, B, T, n, mode) for n in (n_short, n_long)}
                for n, loop in loops.items():
                    np.asarray(loop(params, fresh_cache(), cur, pos, key))
                compile_s = time.time() - t0
                t_at = {}
                for n, loop in loops.items():
                    times = []
                    for _ in range(args.reps):
                        c = fresh_cache()
                        np.asarray(c.length)
                        t0 = time.time()
                        toks = loop(params, c, cur, pos, key)
                        np.asarray(toks)
                        times.append(time.time() - t0)
                    t_at[n] = min(times)
                ms = (t_at[n_long] - t_at[n_short]) / (n_long - n_short) * 1000
                print(f"mode={mode:9s} B={B:3d} T={T:5d} w={args.dtype} kv={args.kv}: "
                      f"{ms:7.3f} ms/step  (slope {n_short}->{n_long}; compile {compile_s:.0f}s; "
                      f"t{n_short}={t_at[n_short]:.3f}s t{n_long}={t_at[n_long]:.3f}s)")
                results.append((mode, B, T, ms))
    return results


if __name__ == "__main__":
    main()
