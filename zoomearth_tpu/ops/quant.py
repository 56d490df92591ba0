"""Weight-only int8 quantization for the decode path.

Decode throughput is weight-bandwidth-bound (measured ~11 ms/step ~= 6.2 GB of bf16
weights over ~607 GB/s effective HBM BW on v5e); storing the decoder matmul weights as
int8 + per-output-channel bf16 scales halves the bytes the hot loop reads. XLA fuses
the dequant into the matmul's read loop (validated end-to-end — microbenchmarks are
unreliable through the axon tunnel).

Opt-in (`quantize_decoder_int8`); the reference has no quantization, accuracy impact
must be validated per checkpoint before serving with it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Decoder matmul weights worth quantizing (the per-step HBM traffic). Embedding stays
# bf16: it serves both the token lookup (gather — int8 gather then dequant is fine but
# logits parity is most argmax-sensitive) and the logits head.
_QUANT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_int8(w: jnp.ndarray):
    """(in, out) weight -> {"q": int8, "s": (1, out) scale in the original dtype}."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(w.dtype)}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for plain or quantized weights.

    Quantized path: mixed-dtype dot_general feeds int8 weights STRAIGHT into the MXU
    (int8 is exactly representable in bf16, converted in the operand pipeline — the
    weights are never dequantized in HBM), then applies the per-output-channel scale to
    the output: x @ (q * s) == (x @ q) * s for column scales. An explicit
    `q.astype(bf16) * s` formulation instead gets hoisted out of the decode while-loop
    by XLA as loop-invariant, silently re-materializing full bf16 weights (measured:
    step time == bf16 step time)."""
    if is_quantized(w):
        y = jax.lax.dot_general(
            x, w["q"], (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=x.dtype
        )
        return y * w["s"].astype(y.dtype)
    if isinstance(w, dict) and "a" in w and "b" in w:  # LoRA (train/lora.py)
        return x @ w["w"] + ((x @ w["a"]) @ w["b"]) * w["s"].astype(x.dtype)
    return x @ w


def quantize_decoder_int8(params, lm_head: bool = False):
    """Quantize the text-decoder layer matmuls in a param tree (returns a new tree;
    norms/biases/embedding untouched). Handles both the plain layout (wq/wk/wv, wg/wu)
    and the fused serving layout from `fuse_decoder_matmuls` (wqkv, wgu).

    lm_head=True additionally stores an int8 COPY of the logits head as
    text["lm_head_q8"] (the token-lookup embedding stays bf16 — gathers don't read
    the whole table, the logits matmul does: 622 MB/step at 3B scale, ~0.9 ms of the
    decode step's HBM bound). logits_from_hidden picks it up when present. Costs
    +311 MB resident HBM for the copy; per-output-column scales, argmax impact must
    be validated per checkpoint like the rest of the int8 path."""
    out = {"vision": params["vision"], "text": dict(params["text"])}
    if lm_head:
        text = params["text"]
        w = (
            text["embed"]["weight"].T
            if "lm_head" not in text
            else text["lm_head"]["weight"]
        )
        out["text"]["lm_head_q8"] = quantize_int8(w)
    new_layers = []
    for layer in params["text"]["layers"]:
        nl = {"input_ln": layer["input_ln"], "post_ln": layer["post_ln"]}
        attn = dict(layer["attn"])
        for k in ("wq", "wk", "wv", "wo", "wqkv"):
            if k in attn:
                attn[k] = quantize_int8(attn[k])
        mlp = {k: quantize_int8(v) for k, v in layer["mlp"].items()}
        nl["attn"] = attn
        nl["mlp"] = mlp
        new_layers.append(nl)
    out["text"]["layers"] = new_layers
    return out


def fuse_decoder_matmuls(params):
    """Serving-time layout transform: concat the attention input projections
    (wq|wk|wv -> wqkv, biases likewise) and the MLP gate/up (wg|wu -> wgu) along the
    output dim.

    Decode dispatches fewer, larger matmuls per layer (7 -> 5): each XLA op carries
    fixed scheduling overhead, and at decode batch sizes the q/k/v matmuls are tiny
    (B x 2048 @ 2048 x {2048,256,256}) — one B x 2048 @ 2048 x 2560 streams the same
    bytes in one op. Numerics are IDENTICAL: x @ concat(A,B) == concat(x@A, x@B), and
    int8 per-output-column scales are preserved under output-dim concat (quantize after
    fusing == quantize then fuse). Compose as fuse -> quantize_decoder_int8.

    Replaces nothing in training; the trainers keep the split layout (checkpoint
    compatibility + per-matrix LoRA)."""
    out = {"vision": params["vision"], "text": dict(params["text"])}
    new_layers = []
    for layer in params["text"]["layers"]:
        a = layer["attn"]
        if "wqkv" in a:  # already fused
            new_layers.append(layer)
            continue
        attn = {
            "wqkv": jnp.concatenate([a["wq"], a["wk"], a["wv"]], axis=1),
            "bqkv": jnp.concatenate([a["bq"], a["bk"], a["bv"]], axis=0),
            "wo": a["wo"],
        }
        m = layer["mlp"]
        mlp = {"wgu": jnp.concatenate([m["wg"], m["wu"]], axis=1), "wd": m["wd"]}
        new_layers.append({
            "input_ln": layer["input_ln"], "post_ln": layer["post_ln"],
            "attn": attn, "mlp": mlp,
        })
    out["text"]["layers"] = new_layers
    return out


def quantized_bytes(params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
