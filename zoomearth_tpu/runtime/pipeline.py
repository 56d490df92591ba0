"""Pair-pipelined two-stage wave runner: the library form of the serving pattern the
throughput bench ships (bench.py pair mode).

Waves of B two-stage episodes flow through the Generator's composable stages so that
wave n's stage-1 DECODE and wave n-1's stage-2 DECODE run CO-BATCHED in one program
(Generator.run_decode_pair / models.decoder.decoder_forward_pair): the per-step weight
stream (~3 GB at 3B int8) is read once for both stages instead of twice, and all host
work (stage-1 token readback, crop building, uploads) hides under device time. This is
vLLM's continuous-batching insight (fold every live sequence into one step — reference
serving surface README.md:105-112) applied wave-wise, which keeps the few-giant-programs
property that wave execution needs on dispatch-expensive runtimes.

The caller supplies three hooks; everything device-side is orchestrated here:
  build_stage1(w) -> PreparedBatch            B-row stage-1 batch for wave w
  build_stage2(w, out1, base_lengths, base_next_pos)
      -> (chunk_batch, keep_len, inert_mask | None)   stage-2 continuation for wave w
  on_complete(w, out1_tokens, out2_tokens)    called as each wave's episode finishes

Stage-1 may optionally start from a shared KV PREFIX (per-image [system+image] span —
the reference prompt layout, src/eval/infer.py:180-184, puts the image before the
question, so that span repeats across an image's ~10.7 LRS-GRO questions): pass
prefix=(holder_cache, keep_len) and make build_stage1 return the [question+instruction]
continuation chunk (prepare_continuation) instead of a full prompt batch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .generate import GenerationConfig, Generator, PreparedBatch


@dataclasses.dataclass
class PairedWaveResult:
    wave: int
    out1: list  # per-row stage-1 token lists (trimmed)
    out2: list  # per-row stage-2 token lists (trimmed; [] for inert rows)


def run_paired_waves(
    gen: Generator,
    n_waves: int,
    build_stage1: Callable[[int], PreparedBatch],
    build_stage2: Callable[[int, list, np.ndarray, np.ndarray], Tuple],
    *,
    gen1: GenerationConfig,
    gen2: GenerationConfig,
    seed: int = 0,
    prefix: Optional[Tuple] = None,  # (holder_cache, keep_len (B,)) for prefix-KV stage 1
    prefix_grow_to: Optional[int] = None,  # stage-1 cache rows when prefix-seeded
    on_complete: Optional[Callable[[int, list, list], None]] = None,
    on_dispatch: Optional[Callable[[int], None]] = None,  # before wave w's prefill
    edges: str = "dummy",  # bootstrap/drain strategy: "dummy" | "solo"
):
    """Run n_waves pair-pipelined two-stage waves; returns [PairedWaveResult] unless
    on_complete consumes them (then returns []).

    All waves must have the SAME batch size B (one compiled program set). The pair
    decode runs min(gen1, gen2).max_new_tokens joint steps; the longer stage finishes
    its remaining tokens in a solo loop — EITHER stage may be the longer one, so the
    reference's asymmetric budgets (stage-1 1024 via infer.py:109, stage-2 800 via
    customized_funcs.py MAX_TOKENS) and per-stage sampling configs both work.

    edges="dummy" (default): bootstrap and drain pair with an inert dummy partner
    (rows start done) so ONE pair program serves every iteration — fewest compiled
    programs. edges="solo": the bootstrap wave decodes stage 1 with a plain solo
    loop and the drain finishes stage 2 solo — two extra (cached) programs, but NO
    dummy KV cache is ever allocated, capping residency at two full caches. At
    3B/B=64 the dummy is a third 3.5 GB cache live during the bootstrap pair +
    solo-tail dispatch window, which OOMs v5e's 15.75 GB (measured r5); solo edges
    are how pair mode runs at batch >= 64. Token output is IDENTICAL either way
    (the pair step is token-identical to solo decode — tests/test_pipeline.py).
    """
    if n_waves <= 0:
        return []
    if edges not in ("dummy", "solo"):
        raise ValueError(f"edges must be 'dummy' or 'solo', got {edges!r}")
    steps = min(gen1.max_new_tokens, gen2.max_new_tokens)
    rest1 = gen1.max_new_tokens - steps
    rest2 = gen2.max_new_tokens - steps
    g_rest1 = dataclasses.replace(gen1, max_new_tokens=rest1)
    g_rest2 = dataclasses.replace(gen2, max_new_tokens=rest2)

    results: list = []
    pending = None  # (wave, base_lengths, base_next_pos, toks_dev, cache1)
    attend1_last = None
    B = None

    def dummy_group(b, attend):
        dcache = gen.new_cache(b)
        dlogits = jnp.zeros((b, gen.cfg.text.vocab_size), jnp.float32)
        return (dlogits, dcache, np.zeros((b,), np.int32), attend,
                jnp.ones((b,), jnp.bool_))

    def stage2_group(pend):
        w, base_lengths, base_next, toks_dev, cache1 = pend
        out1 = gen.trim_generated(np.asarray(toks_dev))
        chunk, keep, inert = build_stage2(w, out1, base_lengths, base_next)
        logits2, cache2, attend2 = gen.run_chunk_prefill(
            cache1, chunk, keep, max_new=gen2.max_new_tokens
        )
        done0 = jnp.asarray(inert, bool) if inert is not None else None
        return out1, (logits2, cache2, chunk.next_pos, attend2, done0)

    for w in range(n_waves):
        b1 = build_stage1(w)
        if on_dispatch is not None:
            on_dispatch(w)
        if prefix is not None:
            holder, pkeep = prefix
            # Grow the stage-1 cache straight to the EPISODE's final extent so
            # stage 2 continues in place with no further growth. Default is the
            # generator's max; callers that know the episode's true final token
            # count pass prefix_grow_to (bucketed) — at 3B/B=64 the 1536-vs-1280
            # overshoot is 0.6 GB per resident cache, the difference between
            # pair+prefix fitting v5e HBM and the stage-2 chunk prefill OOMing.
            logits1, cache1, attend1 = gen.run_chunk_prefill(
                holder, b1, pkeep, max_new=gen1.max_new_tokens,
                grow_to=prefix_grow_to or gen.max_cache_len,
            )
            base_lengths = np.asarray(pkeep) + np.asarray(b1.lengths)
        else:
            logits1, cache1, attend1 = gen.run_prefill(b1, max_new=gen1.max_new_tokens)
            base_lengths = np.asarray(b1.lengths)
        attend1_last = attend1
        B = logits1.shape[0]
        if pending is None and edges == "solo":
            # solo bootstrap: no partner wave yet — stage 1 decodes its full budget
            # in the plain solo loop instead of pairing with a dummy, so no third
            # KV cache is ever resident (see the edges= docstring)
            toks_dev, cache1 = gen.run_decode(
                logits1, cache1, b1.next_pos, gen1, seed=seed + 2 * w, attend=attend1
            )
            toks_dev.copy_to_host_async()
            pending = (w, base_lengths, np.asarray(b1.next_pos), toks_dev, cache1)
            continue
        if pending is not None:
            out1_prev, group_b = stage2_group(pending)
        else:
            out1_prev, group_b = None, dummy_group(B, None)
        buf_a, done_a, la2, cache1, buf_b, done_b, lb2, cache_b2 = gen.run_decode_pair(
            (logits1, cache1, b1.next_pos, attend1, None), group_b,
            steps=steps, temperature=gen1.temperature, top_p=gen1.top_p,
            temperature_b=gen2.temperature, top_p_b=gen2.top_p,
            seed=seed + 2 * w,
        )
        if rest2 > 0 and pending is not None:
            # stage 2 is the LONGER budget: it finishes its remaining tokens solo.
            # Skipped on the bootstrap wave — its dummy partner's output is
            # discarded, and the dummy's attend=None would compile a solo-decode
            # program no real wave reuses (40-250 s each on a remote-compile tunnel)
            rest_b, _ = gen.run_decode(
                lb2, cache_b2, np.asarray(group_b[2]) + steps, g_rest2,
                seed=seed + 2 * w + 1, attend=group_b[3], done0=done_b,
            )
            buf_b = jnp.concatenate([buf_b, rest_b], axis=1)
        # stage 2 is FINISHED once its token buffer exists: drop the cache/logits
        # references NOW. Held through the next iteration (the natural rebind point)
        # the dead stage-2 cache keeps a full (B, Hkv, T, D) KV tree resident during
        # wave w+1's prefill + chunk-prefill — a third ~2.7 GB cache at 3B/B=48 that
        # OOM'd v5e the first time pair+prefix ran at real scale (BENCH r5).
        lb2 = cache_b2 = done_b = group_b = None
        # register the d2h copy at dispatch time: it fires the moment the pair loop
        # completes, while the solo tail still runs (remote tunnels otherwise pay a
        # full extra RTT when the copy is first issued inside np.asarray)
        buf_b.copy_to_host_async()
        if rest1 > 0:
            rest, cache1 = gen.run_decode(
                la2, cache1, np.asarray(b1.next_pos) + steps, g_rest1,
                seed=seed + 2 * w + 1, attend=attend1, done0=done_a,
            )
            toks_dev = jnp.concatenate([buf_a, rest], axis=1)
        else:
            toks_dev = buf_a
        toks_dev.copy_to_host_async()
        if pending is not None:
            out2_prev = gen.trim_generated(np.asarray(buf_b))
            pw = pending[0]
            if on_complete is not None:
                on_complete(pw, out1_prev, out2_prev)
            else:
                results.append(PairedWaveResult(pw, out1_prev, out2_prev))
        buf_b = None  # bootstrap wave: the dummy partner's buffer is never read
        pending = (w, base_lengths, np.asarray(b1.next_pos), toks_dev, cache1)
    # drain: the last wave's stage 2 — solo loop (edges="solo": no dummy cache), or
    # paired with an inert dummy stage-1 group (edges="dummy": one pair program)
    out1_prev, group_b = stage2_group(pending)
    if edges == "solo":
        logits2, cache2, next2, attend2, done0 = group_b
        buf_b, _ = gen.run_decode(
            logits2, cache2, np.asarray(next2), gen2,
            seed=seed + 2 * n_waves, attend=attend2, done0=done0,
        )
    else:
        _, _, _, _, buf_b, done_b, lb2, cache_b2 = gen.run_decode_pair(
            dummy_group(B, attend1_last), group_b,
            steps=steps, temperature=gen1.temperature, top_p=gen1.top_p,
            temperature_b=gen2.temperature, top_p_b=gen2.top_p,
            seed=seed + 2 * n_waves,
        )
        if rest2 > 0:
            rest_b, _ = gen.run_decode(
                lb2, cache_b2, np.asarray(group_b[2]) + steps, g_rest2,
                seed=seed + 2 * n_waves + 1, attend=group_b[3], done0=done_b,
            )
            buf_b = jnp.concatenate([buf_b, rest_b], axis=1)
    buf_b.copy_to_host_async()
    out2_prev = gen.trim_generated(np.asarray(buf_b))
    pw = pending[0]
    if on_complete is not None:
        on_complete(pw, out1_prev, out2_prev)
    else:
        results.append(PairedWaveResult(pw, out1_prev, out2_prev))
    return results
