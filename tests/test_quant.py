"""Weight-only int8 quantization: mechanics + output quality on the tiny model."""

import jax
import numpy as np
import pytest

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.ops.quant import is_quantized, qdot, quantize_decoder_int8, quantize_int8

CFG = VLMConfig.tiny()


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    qw = quantize_int8(jax.numpy.asarray(w))
    assert qw["q"].dtype == np.int8
    deq = np.asarray(qw["q"], np.float32) * np.asarray(qw["s"], np.float32)
    # per-channel symmetric: max error <= scale/2 per element
    max_scale = np.asarray(qw["s"]).max()
    assert np.abs(deq - w).max() <= max_scale * 0.51


def test_qdot_matches_dequantized_matmul():
    rng = np.random.default_rng(1)
    x = jax.numpy.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jax.numpy.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    qw = quantize_int8(w)
    ref = np.asarray(x) @ (np.asarray(qw["q"], np.float32) * np.asarray(qw["s"], np.float32))
    np.testing.assert_allclose(np.asarray(qdot(x, qw)), ref, rtol=1e-5, atol=1e-5)
    # plain path unchanged
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(x @ w), rtol=1e-6)


def test_quantize_decoder_structure():
    params = init_vlm_params(jax.random.key(0), CFG)
    qp = quantize_decoder_int8(params)
    l0 = qp["text"]["layers"][0]
    assert is_quantized(l0["attn"]["wq"]) and is_quantized(l0["mlp"]["wd"])
    # untouched parts share buffers
    assert qp["text"]["embed"]["weight"] is params["text"]["embed"]["weight"]
    assert qp["vision"] is params["vision"]
    assert not is_quantized(l0["attn"]["bq"])


def test_int8_generation_quality_tiny():
    """Greedy decode with int8 decoder weights should mostly match bf16/f32 —
    per-channel int8 logit perturbations are small relative to logit gaps."""
    from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, prepare_batch

    params = init_vlm_params(jax.random.key(3), CFG)
    qparams = quantize_decoder_int8(params)
    rng = np.random.default_rng(2)
    tl = [[CFG.tokens.im_start] + list(rng.integers(1, 400, size=10)) for _ in range(2)]
    b = prepare_batch(CFG, tl, [[], []], length_buckets=(32,), patch_buckets=(0,))
    g = GenerationConfig(max_new_tokens=12, temperature=0.0)
    out_f = Generator(params, CFG, max_cache_len=64, cache_dtype="float32").generate(b, g)
    out_q = Generator(qparams, CFG, max_cache_len=64, cache_dtype="float32").generate(b, g)
    # token-level agreement (random tiny model = near-uniform logits, the hardest
    # case for quantization; require majority agreement on the first tokens)
    agree = sum(
        a == b for row_f, row_q in zip(out_f, out_q) for a, b in zip(row_f[:4], row_q[:4])
    )
    assert agree >= 4  # of 8 compared tokens


def test_fused_matmuls_bit_identical():
    """fuse_decoder_matmuls (serving layout) must be numerically IDENTICAL to the split
    layout, plain and int8: x @ concat(A,B) == concat(x@A, x@B) and per-output-column
    int8 scales are preserved under output-dim concat."""
    import jax.numpy as jnp

    from zoomearth_tpu.models.decoder import decoder_forward
    from zoomearth_tpu.ops.quant import fuse_decoder_matmuls

    params = init_vlm_params(jax.random.key(5), CFG, jnp.float32)
    fused = fuse_decoder_matmuls(params)
    l0 = fused["text"]["layers"][0]
    assert "wqkv" in l0["attn"] and "wgu" in l0["mlp"] and "wq" not in l0["attn"]
    x = jax.random.normal(jax.random.key(6), (2, 8, CFG.text.hidden_size), jnp.float32)
    pos = jnp.zeros((3, 2, 8), jnp.int32) + jnp.arange(8)[None, None]
    h_split, _ = decoder_forward(params["text"], CFG.text, x, pos)
    h_fused, _ = decoder_forward(fused["text"], CFG.text, x, pos)
    np.testing.assert_array_equal(np.asarray(h_split), np.asarray(h_fused))
    hq_split, _ = decoder_forward(quantize_decoder_int8(params)["text"], CFG.text, x, pos)
    hq_fused, _ = decoder_forward(quantize_decoder_int8(fused)["text"], CFG.text, x, pos)
    np.testing.assert_array_equal(np.asarray(hq_split), np.asarray(hq_fused))
    # idempotent
    assert fuse_decoder_matmuls(fused)["text"]["layers"][0] is l0


def test_int8_kv_cache_generation():
    """int8 KV cache (per-token scales): greedy decode should closely track the bf16
    cache (exact scaled-einsum algebra; only the int8 rounding of cached kv differs)."""
    from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, prepare_batch

    params = init_vlm_params(jax.random.key(3), CFG)
    rng = np.random.default_rng(2)
    tl = [[CFG.tokens.im_start] + list(rng.integers(1, 400, size=12)) for _ in range(2)]
    b = prepare_batch(CFG, tl, [[], []], length_buckets=(32,), patch_buckets=(0,))
    g = GenerationConfig(max_new_tokens=10, temperature=0.0)
    out_f = Generator(params, CFG, max_cache_len=64, cache_dtype="float32").generate(b, g)
    out_q = Generator(params, CFG, max_cache_len=64, cache_dtype="int8").generate(b, g)
    # near-uniform random-model logits are the worst case; require early-token agreement
    agree = sum(a == c for rf, rq in zip(out_f, out_q) for a, c in zip(rf[:4], rq[:4]))
    assert agree >= 4  # of 8 compared


def test_int8_kv_continuation():
    """Two-stage KV-reuse continuation over an int8 cache (scale-aware chunk prefill)."""
    from zoomearth_tpu.runtime.generate import (
        GenerationConfig, Generator, prepare_batch, prepare_continuation,
    )

    params = init_vlm_params(jax.random.key(4), CFG)
    rng = np.random.default_rng(5)
    tl = [list(rng.integers(1, 400, size=10)) for _ in range(2)]
    b = prepare_batch(CFG, tl, [[], []], length_buckets=(16,), patch_buckets=(0,))
    gen = Generator(params, CFG, max_cache_len=64, cache_dtype="int8")
    g1 = GenerationConfig(max_new_tokens=6, temperature=0.0)
    out1, cache = gen.generate(b, g1, return_cache=True)
    chunks = [list(rng.integers(1, 400, size=4)) for _ in range(2)]
    keep = np.asarray([int(b.lengths[i]) + len(out1[i]) for i in range(2)], np.int32)
    starts = [int(b.next_pos[i]) + len(out1[i]) for i in range(2)]
    bc = prepare_continuation(CFG, chunks, [[], []], starts, length_buckets=(16,), patch_buckets=(0,))
    out2 = gen.continue_generate(cache, bc, keep, GenerationConfig(max_new_tokens=5, temperature=0.0))
    assert len(out2) == 2 and all(isinstance(r, list) for r in out2)
