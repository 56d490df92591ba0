"""run_paired_waves unit tests (edge cases + budget envelopes).

The identity-vs-sequential coverage lives in test_eval.py (run_inference pipelined)
and test_midsize_parity.py; this file exercises the runner's own contract.
"""

import numpy as np
import pytest

import jax

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.runtime.generate import (
    GenerationConfig,
    Generator,
    prepare_batch,
    prepare_continuation,
)
from zoomearth_tpu.runtime.pipeline import run_paired_waves

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def generator():
    params = init_vlm_params(jax.random.key(0), CFG)
    return Generator(params, CFG, max_cache_len=64, cache_dtype="float32")


def _boom(*a, **kw):
    raise AssertionError("hook must not be called")


def test_zero_waves_returns_empty(generator):
    """ADVICE r4 (low): n_waves=0 used to crash in the drain (stage2_group(None))."""
    res = run_paired_waves(
        generator, 0, _boom, _boom,
        gen1=GenerationConfig(max_new_tokens=4),
        gen2=GenerationConfig(max_new_tokens=4),
    )
    assert res == []


def _mk_hooks(generator, B, n_waves):
    """Deterministic text-only two-stage hooks shared by the envelope tests."""
    cfg = generator.cfg
    tok = cfg.tokens

    def build_stage1(w):
        rngw = np.random.default_rng(w)
        seqs = [[tok.im_start] + list(rngw.integers(1, 300, size=4 + b)) for b in range(B)]
        return prepare_batch(cfg, seqs, [[] for _ in range(B)],
                             length_buckets=(16,), patch_buckets=(0,))

    def build_stage2(w, out1, base_lengths, base_next):
        rngw = np.random.default_rng(100 + w)
        chunks = [list(rngw.integers(1, 300, size=3)) for _ in range(B)]
        keep = np.asarray([int(base_lengths[b]) + len(out1[b]) for b in range(B)], np.int32)
        starts = [int(base_next[b]) + len(out1[b]) for b in range(B)]
        bc = prepare_continuation(cfg, chunks, [[] for _ in range(B)], starts,
                                  length_buckets=(16,))
        return bc, keep, None

    return build_stage1, build_stage2


def _sequential_reference(generator, B, n_waves, gen1, gen2, seed):
    """Same episodes executed wave-at-a-time through the composable stages (no
    pairing): the pipelined runner must reproduce these tokens exactly."""
    s1, s2 = _mk_hooks(generator, B, n_waves)
    out = []
    for w in range(n_waves):
        b1 = s1(w)
        logits1, cache1, attend1 = generator.run_prefill(b1, max_new=gen1.max_new_tokens)
        toks, cache1 = generator.run_decode(logits1, cache1, b1.next_pos, gen1,
                                            seed=seed + 2 * w, attend=attend1)
        out1 = generator.trim_generated(np.asarray(toks))
        chunk, keep, _ = s2(w, out1, np.asarray(b1.lengths), np.asarray(b1.next_pos))
        logits2, cache2, attend2 = generator.run_chunk_prefill(
            cache1, chunk, keep, max_new=gen2.max_new_tokens)
        toks2, _ = generator.run_decode(logits2, cache2, chunk.next_pos, gen2,
                                        seed=seed + 2 * w + 1, attend=attend2)
        out.append((out1, generator.trim_generated(np.asarray(toks2))))
    return out


def test_paired_matches_reference_greedy(generator):
    B, n_waves = 2, 3
    gen1 = GenerationConfig(max_new_tokens=6, temperature=0.0)
    gen2 = GenerationConfig(max_new_tokens=4, temperature=0.0)
    s1, s2 = _mk_hooks(generator, B, n_waves)
    got = {}
    run_paired_waves(generator, n_waves, s1, s2, gen1=gen1, gen2=gen2, seed=0,
                     on_complete=lambda w, o1, o2: got.__setitem__(w, (o1, o2)))
    ref = _sequential_reference(generator, B, n_waves, gen1, gen2, seed=0)
    for w in range(n_waves):
        assert got[w][0] == ref[w][0], f"wave {w} stage-1 mismatch"
        assert got[w][1] == ref[w][1], f"wave {w} stage-2 mismatch"


@pytest.mark.parametrize("n1,n2", [(7, 4), (4, 7)])
def test_paired_asymmetric_budgets(generator, n1, n2):
    """VERDICT r4 #6: either stage may have the longer budget (reference runs
    stage-1 1024 / stage-2 800); the shorter group's rows finish inside the pair
    loop, the longer group's tail runs solo — tokens must match the sequential
    reference exactly (greedy)."""
    B, n_waves = 2, 3
    gen1 = GenerationConfig(max_new_tokens=n1, temperature=0.0)
    gen2 = GenerationConfig(max_new_tokens=n2, temperature=0.0)
    s1, s2 = _mk_hooks(generator, B, n_waves)
    got = {}
    run_paired_waves(generator, n_waves, s1, s2, gen1=gen1, gen2=gen2, seed=0,
                     on_complete=lambda w, o1, o2: got.__setitem__(w, (o1, o2)))
    ref = _sequential_reference(generator, B, n_waves, gen1, gen2, seed=0)
    for w in range(n_waves):
        assert got[w][0] == ref[w][0], f"wave {w} stage-1 mismatch"
        assert got[w][1] == ref[w][1], f"wave {w} stage-2 mismatch"


def test_paired_unequal_temperatures(generator):
    """Per-stage sampling configs (previously a ValueError): greedy stage 1 must
    stay deterministic while stage 2 samples at its own temperature."""
    B, n_waves = 2, 2
    gen1 = GenerationConfig(max_new_tokens=5, temperature=0.0)
    gen2 = GenerationConfig(max_new_tokens=4, temperature=0.9, top_p=0.8)
    s1, s2 = _mk_hooks(generator, B, n_waves)
    got = {}
    run_paired_waves(generator, n_waves, s1, s2, gen1=gen1, gen2=gen2, seed=0,
                     on_complete=lambda w, o1, o2: got.__setitem__(w, (o1, o2)))
    # stage 1 is greedy: identical to the sequential greedy reference regardless of
    # the partner group's sampling
    ref = _sequential_reference(generator, B, n_waves, gen1,
                                GenerationConfig(max_new_tokens=4, temperature=0.0),
                                seed=0)
    for w in range(n_waves):
        assert got[w][0] == ref[w][0], f"wave {w} stage-1 mismatch"
        assert all(len(t) <= 4 for t in got[w][1])


def test_bootstrap_skips_dummy_rest_tail():
    """With gen2 > gen1, the bootstrap wave's dummy partner must not compile a
    throwaway solo-tail program (attend=None, 40-250 s each on a remote-compile
    tunnel)."""
    params = init_vlm_params(jax.random.key(1), CFG)
    gen = Generator(params, CFG, max_cache_len=64, cache_dtype="float32")
    gen1 = GenerationConfig(max_new_tokens=3, temperature=0.0)
    gen2 = GenerationConfig(max_new_tokens=6, temperature=0.0)
    s1, s2 = _mk_hooks(gen, 2, 2)
    calls = []
    orig = gen.run_decode
    gen.run_decode = lambda *a, **kw: (calls.append(kw.get("done0")), orig(*a, **kw))[1]
    try:
        got = {}
        run_paired_waves(gen, 2, s1, s2, gen1=gen1, gen2=gen2, seed=0,
                         on_complete=lambda w, o1, o2: got.__setitem__(w, (o1, o2)))
    finally:
        gen.run_decode = orig
    # one rest-tail per REAL stage-2 group: waves 1..n-1 plus the drain = n_waves;
    # the bootstrap dummy (all rows pre-done) must not add a call
    assert len(calls) == 2, len(calls)
    # and the episodes still match the sequential reference
    ref = _sequential_reference(gen, 2, 2, gen1, gen2, seed=0)
    for w in range(2):
        assert got[w][0] == ref[w][0] and got[w][1] == ref[w][1], f"wave {w}"


@pytest.mark.parametrize("n1,n2,n_waves", [(6, 4, 3), (4, 7, 2), (5, 5, 1)])
def test_solo_edges_match_dummy_edges(generator, n1, n2, n_waves):
    """edges="solo" (bootstrap decodes stage 1 solo, drain finishes stage 2 solo —
    no dummy KV cache ever allocated; the batch>=64 OOM fix, r5) must produce the
    SAME greedy tokens as the default dummy-partner edges, and must never call
    new_cache (the dummy allocation)."""
    gen1 = GenerationConfig(max_new_tokens=n1, temperature=0.0)
    gen2 = GenerationConfig(max_new_tokens=n2, temperature=0.0)
    s1, s2 = _mk_hooks(generator, 2, n_waves)
    allocs = []
    orig = generator.new_cache
    generator.new_cache = lambda *a, **kw: (allocs.append(a), orig(*a, **kw))[1]
    try:
        got = {}
        run_paired_waves(generator, n_waves, s1, s2, gen1=gen1, gen2=gen2, seed=0,
                         edges="solo",
                         on_complete=lambda w, o1, o2: got.__setitem__(w, (o1, o2)))
    finally:
        generator.new_cache = orig
    assert allocs == [], "solo edges must not allocate a dummy cache"
    ref = _sequential_reference(generator, 2, n_waves, gen1, gen2, seed=0)
    for w in range(n_waves):
        assert got[w][0] == ref[w][0], f"wave {w} stage-1 mismatch"
        assert got[w][1] == ref[w][1], f"wave {w} stage-2 mismatch"


def test_bad_edges_value(generator):
    with pytest.raises(ValueError):
        run_paired_waves(generator, 1, _boom, _boom,
                         gen1=GenerationConfig(max_new_tokens=2),
                         gen2=GenerationConfig(max_new_tokens=2), edges="nope")


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_paired_random_budget_combinations(generator, seed):
    """Property: for ANY (gen1, gen2) budget combination the pair runner's greedy
    tokens equal the sequential reference (catches off-by-ones in the joint-steps /
    solo-tail split logic)."""
    rng = np.random.default_rng(seed)
    n1 = int(rng.integers(1, 9))
    n2 = int(rng.integers(1, 9))
    n_waves = int(rng.integers(1, 4))
    gen1 = GenerationConfig(max_new_tokens=n1, temperature=0.0)
    gen2 = GenerationConfig(max_new_tokens=n2, temperature=0.0)
    s1, s2 = _mk_hooks(generator, 2, n_waves)
    got = {}
    run_paired_waves(generator, n_waves, s1, s2, gen1=gen1, gen2=gen2, seed=0,
                     on_complete=lambda w, o1, o2: got.__setitem__(w, (o1, o2)))
    ref = _sequential_reference(generator, 2, n_waves, gen1, gen2, seed=0)
    for w in range(n_waves):
        assert got[w][0] == ref[w][0], f"seed {seed} wave {w} stage-1 (n1={n1}, n2={n2})"
        assert got[w][1] == ref[w][1], f"seed {seed} wave {w} stage-2 (n1={n1}, n2={n2})"
