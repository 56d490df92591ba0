"""On-device token sampling: greedy, temperature, top-p.

The reference samples on host via HF generate (demo.py:14 greedy; infer.py:112-115
temperature 0.01 + do_sample). Here sampling is a jittable function of fp32 logits so
the decode loop never leaves the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """(B, V) fp32 -> (B,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample(logits: jnp.ndarray, key, temperature: float = 1.0, top_p: float = 1.0) -> jnp.ndarray:
    """Temperature + nucleus sampling. temperature <= 0 means greedy."""
    if temperature <= 0.0:
        return greedy(logits)
    scaled = logits / temperature
    if top_p < 1.0:
        scaled = _top_p_filter(scaled, top_p)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def _top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Mask logits outside the nucleus (smallest set with cumulative prob >= top_p)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens while the cumulative prob *before* them is < top_p
    keep_sorted = (cum - sorted_probs) < top_p
    # threshold logit: smallest kept logit
    kept = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(kept, axis=-1, keepdims=True)
    return jnp.where(logits >= threshold, logits, -jnp.inf)
