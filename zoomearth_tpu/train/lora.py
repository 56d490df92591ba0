"""LoRA adapters for the text decoder (the reference's PEFT path,
grpo_trainer.py:293-305 + peft get_peft_model).

TPU-native design: a LoRA-wrapped weight is a dict leaf {"w": base, "a": (in, r),
"b": (r, out), "s": alpha/r} that ops.quant.qdot dispatches on — every decoder matmul
(decode, prefill, training) picks it up with no model-code changes. The base stays
frozen by masking its optimizer updates; the KL reference model is the ADAPTER-DISABLED
policy (reference grpo_trainer.py:299-303: PEFT models disable adapters instead of
keeping a second copy), which here is just a view of the same base arrays — zero extra
HBM.

b is zero-initialized (standard LoRA), so at step 0 the adapted policy equals the base
model exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def is_lora(w) -> bool:
    return isinstance(w, dict) and "a" in w and "b" in w and "w" in w


def apply_lora(params, key, *, r: int = 8, alpha: float = 16.0,
               targets: Sequence[str] = DEFAULT_TARGETS):
    """Wrap the text-decoder matmuls of a param tree with LoRA adapters."""
    out = {"vision": params["vision"], "text": dict(params["text"])}
    layers = []
    for layer in params["text"]["layers"]:
        nl = {"input_ln": layer["input_ln"], "post_ln": layer["post_ln"]}
        for group in ("attn", "mlp"):
            g = dict(layer[group])
            for name in targets:
                if name in g and not isinstance(g[name], dict):
                    w = g[name]
                    key, sub = jax.random.split(key)
                    a = (jax.random.normal(sub, (w.shape[0], r)) * (1.0 / r)).astype(w.dtype)
                    b = jnp.zeros((r, w.shape[1]), w.dtype)
                    g[name] = {"w": w, "a": a, "b": b, "s": jnp.asarray(alpha / r, w.dtype)}
            nl[group] = g
        layers.append(nl)
    out["text"]["layers"] = layers
    return out


def strip_lora(params):
    """Adapter-DISABLED view of a LoRA tree (shares the base arrays — the PEFT
    reference-model semantics, no copy)."""

    def strip(node):
        if is_lora(node):
            return node["w"]
        if isinstance(node, dict):
            return {k: strip(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(strip(v) for v in node)
        return node

    return strip(params)


def merge_lora(params):
    """Fold adapters into the base weights (export / serving handoff)."""

    def merge(node):
        if is_lora(node):
            return node["w"] + (node["a"].astype(jnp.float32) @ node["b"].astype(jnp.float32)
                                * node["s"].astype(jnp.float32)).astype(node["w"].dtype)
        if isinstance(node, dict):
            return {k: merge(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(merge(v) for v in node)
        return node

    return merge(params)


def mask_base_updates(updates, params):
    """Zero the optimizer updates of every LoRA BASE weight (adapters train, base
    frozen — including weight decay, which plain zero-grad would not stop)."""

    def mask(u, p):
        if is_lora(p):
            return {"w": jax.tree.map(jnp.zeros_like, u["w"]), "a": u["a"], "b": u["b"],
                    "s": jnp.zeros_like(u["s"])}
        return u

    return jax.tree.map(mask, updates, params,
                        is_leaf=lambda x: is_lora(x))
