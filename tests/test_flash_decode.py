"""flash_decode_attention (Pallas contiguous-cache decode kernel) vs the XLA oracle.

Interpret-mode on CPU; numerical parity requires highest matmul precision (the default
CPU matmul runs reduced-precision and adds ~1e-3 noise to BOTH implementations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zoomearth_tpu.ops.attention import decode_attention
from zoomearth_tpu.ops.flash_decode import flash_decode_attention


@pytest.fixture(autouse=True)
def _highest_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


@pytest.mark.parametrize(
    "B,H,Hkv,D,T,chunk",
    [
        (4, 16, 2, 128, 1024, 256),  # flagship GQA shape
        (3, 8, 4, 128, 512, 128),
        (2, 8, 8, 128, 512, 256),  # MHA (G=1)
        (2, 4, 2, 64, 256, 128),  # tiny-config shape
    ],
)
def test_matches_oracle(B, H, Hkv, D, T, chunk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, T + 1, size=B), jnp.int32)
    ref = decode_attention(q, k, v, kv_len=lens)
    out = flash_decode_attention(q, k, v, lens, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_edge_lengths():
    """len=1 (only the just-written token), len=T (full cache), len at chunk borders."""
    rng = np.random.default_rng(1)
    B, H, Hkv, D, T, chunk = 5, 4, 2, 64, 512, 128
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    lens = jnp.asarray([1, T, chunk, chunk + 1, chunk - 1], jnp.int32)
    ref = decode_attention(q, k, v, kv_len=lens)
    out = flash_decode_attention(q, k, v, lens, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_garbage_beyond_length_ignored():
    """Slots at/after kv_len must not affect the output (the cache holds garbage there
    — idle engine rows write junk into their own tail)."""
    rng = np.random.default_rng(2)
    B, H, Hkv, D, T, chunk = 2, 4, 2, 64, 256, 128
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    lens = jnp.asarray([100, 200], jnp.int32)
    out1 = flash_decode_attention(q, jnp.asarray(k), jnp.asarray(v), lens, chunk=chunk, interpret=True)
    k2, v2 = k.copy(), v.copy()
    k2[0, :, 100:] = 1e4
    v2[0, :, 100:] = -1e4
    k2[1, :, 200:] = 1e4
    v2[1, :, 200:] = -1e4
    out2 = flash_decode_attention(q, jnp.asarray(k2), jnp.asarray(v2), lens, chunk=chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_int8_quant_matches_q8_oracle():
    """The int8 branch (scale blocks streamed per chunk) vs decode_attention_q8 —
    both are exact w.r.t. the quantized values, so they must agree to fp tolerance.
    Ragged lengths exercise the dead-chunk skip with live scale blocks."""
    from zoomearth_tpu.ops.attention import decode_attention_q8

    rng = np.random.default_rng(4)
    B, H, Hkv, D, T, chunk = 4, 16, 2, 128, 1024, 256
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, Hkv, T, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (B, Hkv, T, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.03, (B, Hkv, T)), jnp.float32).astype(jnp.bfloat16)
    vs = jnp.asarray(rng.uniform(0.005, 0.03, (B, Hkv, T)), jnp.float32).astype(jnp.bfloat16)
    lens = jnp.asarray([1, T, chunk + 3, T // 2], jnp.int32)
    ref = decode_attention_q8(q, k8, v8, ks, vs, kv_len=lens)
    out = flash_decode_attention(q, k8, v8, lens, ks, vs, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4, rtol=3e-4)


def test_3d_q_shape():
    rng = np.random.default_rng(3)
    B, H, Hkv, D, T = 2, 4, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    lens = jnp.asarray([50, 256], jnp.int32)
    out = flash_decode_attention(q, k, v, lens, chunk=128, interpret=True)
    assert out.shape == (B, H, D)
    ref = decode_attention(q[:, None], k, v, kv_len=lens)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
