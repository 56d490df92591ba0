"""InternVL family parity vs a tiny random-init HF oracle
(transformers InternVLForConditionalGeneration — the natively-supported equivalent of
the reference's AutoModel-resolved InternVL, vlm_modules/internvl_module.py:26-39).

Covers: InternViT tower + pixel-shuffle + projector numerics, embeds-input merge into
<IMG_CONTEXT> positions, full-logits parity, and greedy token-identity through our
Generator's embeds path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from zoomearth_tpu.config import InternVLVLMConfig
from zoomearth_tpu.models.internvit import (
    internvit_embeds,
    internvl_params_from_hf,
    patchify_tiles,
)
from zoomearth_tpu.models.internvl import prepare_internvl_batch
from zoomearth_tpu.models.vlm import vlm_forward
from zoomearth_tpu.runtime.generate import GenerationConfig, Generator

CFG = InternVLVLMConfig.tiny()


@pytest.fixture(scope="module")
def oracle():
    from transformers import (
        InternVLConfig,
        InternVLForConditionalGeneration,
        InternVLVisionConfig,
        Qwen2Config,
    )

    v = CFG.vision
    t = CFG.text
    vcfg = InternVLVisionConfig(
        hidden_size=v.hidden_size, num_hidden_layers=v.depth,
        num_attention_heads=v.num_heads, intermediate_size=v.intermediate_size,
        image_size=[v.image_size, v.image_size], patch_size=[v.patch_size, v.patch_size],
        use_qk_norm=v.use_qk_norm, layer_scale_init_value=v.layer_scale_init,
        norm_type=v.norm_type, attention_bias=v.attention_bias, hidden_act=v.hidden_act,
        use_absolute_position_embeddings=True,
    )
    tcfg = Qwen2Config(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size, num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads, num_key_value_heads=t.num_key_value_heads,
        head_dim=t.head_dim, tie_word_embeddings=t.tie_word_embeddings,
        rope_theta=t.rope_theta, max_position_embeddings=t.max_position_embeddings,
        attention_dropout=0.0,
    )
    full = InternVLConfig(
        vision_config=vcfg, text_config=tcfg,
        image_token_id=CFG.tokens.image_context,
        downsample_ratio=CFG.vision.downsample_ratio,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
    )
    torch.manual_seed(0)
    model = InternVLForConditionalGeneration(full).eval()
    # random-but-reasonable values for zero-initialized embeddings/tokens
    with torch.no_grad():
        emb = model.model.vision_tower.embeddings
        emb.cls_token.normal_(0, 0.02)
        emb.position_embeddings.normal_(0, 0.02)
    return model


def _inputs(seed=0, n_text=9):
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    nit = CFG.vision.num_image_token  # 1 at the tiny size
    ids = (
        [tok.im_start] + list(rng.integers(1, 400, size=4))
        + [tok.img_start] + [tok.image_context] * nit + [tok.img_end]
        + list(rng.integers(1, 400, size=n_text))
    )
    pixels = rng.standard_normal((1, 3, CFG.vision.image_size, CFG.vision.image_size)).astype(np.float32)
    return ids, pixels


def test_vision_embeds_parity(oracle):
    _, pixels = _inputs()
    hf_feats = oracle.model.get_image_features(torch.from_numpy(pixels))
    params = internvl_params_from_hf(oracle, CFG)
    ours = internvit_embeds(params["vision"], CFG.vision, jnp.asarray(patchify_tiles(pixels)))
    np.testing.assert_allclose(
        np.asarray(ours), hf_feats.detach().numpy().reshape(-1, hf_feats.shape[-1]),
        atol=2e-4, rtol=1e-3,
    )


def test_full_logits_parity(oracle):
    ids, pixels = _inputs(seed=1)
    with torch.no_grad():
        hf_logits = oracle(
            input_ids=torch.tensor([ids]), pixel_values=torch.from_numpy(pixels)
        ).logits[0].numpy()
    params = internvl_params_from_hf(oracle, CFG)
    embeds = internvit_embeds(params["vision"], CFG.vision, jnp.asarray(patchify_tiles(pixels)))
    S = len(ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, 1, S))
    logits, _ = vlm_forward(
        params, CFG, jnp.asarray([ids], jnp.int32), pos, vision_embeds=embeds
    )
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits, atol=3e-4, rtol=1e-3)


def test_greedy_generate_token_identity(oracle):
    ids, pixels = _inputs(seed=2)
    max_new = 12
    with torch.no_grad():
        hf_out = oracle.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.from_numpy(pixels),
            max_new_tokens=max_new, do_sample=False,
            eos_token_id=None, pad_token_id=CFG.tokens.pad,
        )[0, len(ids):].tolist()
    params = internvl_params_from_hf(oracle, CFG)
    embeds = internvit_embeds(params["vision"], CFG.vision, jnp.asarray(patchify_tiles(pixels)))
    batch = prepare_internvl_batch(CFG, [ids], embeds, length_buckets=(64,))
    gen = Generator(params, CFG, max_cache_len=128, cache_dtype="float32")
    ours = gen.generate(batch, GenerationConfig(max_new_tokens=max_new))[0]
    # our runtime stops at eos; compare the emitted prefix token-for-token
    assert ours == hf_out[: len(ours)] and len(ours) >= 1
    if CFG.tokens.eos not in hf_out and CFG.tokens.endoftext not in hf_out:
        assert ours == hf_out
