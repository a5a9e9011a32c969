"""CLIP tower parity vs HF CLIPVision/TextModelWithProjection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hicom_tpu.models.clip import ClipTextConfig, ClipTextEncoder, ClipVisionConfig, ClipVisionTower
from hicom_tpu.weights import assert_tree_match, convert_clip_text, convert_clip_vision

VIS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=3,
           num_attention_heads=4, image_size=56, patch_size=14, projection_dim=48)
TXT = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=4, vocab_size=99, max_position_embeddings=16,
           projection_dim=48)


def test_clip_vision_parity():
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(transformers.CLIPVisionConfig(**VIS)).eval()
    pixels = np.random.default_rng(0).uniform(-1, 1, (2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(pixels), output_hidden_states=True)
    ref_feat = out.hidden_states[-2][:, 1:].numpy().reshape(2, 4, 4, 64)
    with torch.no_grad():
        last = hf.vision_model.post_layernorm(out.hidden_states[-1])
        ref_embeds = hf.visual_projection(last[:, 1:]).numpy().reshape(2, 4, 4, 48)

    model = ClipVisionTower(config=ClipVisionConfig(**VIS), select_layer=-2)
    params = convert_clip_vision({k: v.numpy() for k, v in hf.state_dict().items()})
    expected = model.init(jax.random.PRNGKey(0), jnp.asarray(pixels))["params"]
    assert_tree_match(expected, params)
    feat, emb = model.apply({"params": params}, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(emb), ref_embeds, rtol=3e-4, atol=3e-4)


def test_clip_text_parity():
    torch.manual_seed(1)
    eos_id = 98
    hf_cfg = transformers.CLIPTextConfig(eos_token_id=eos_id, bos_token_id=97, **TXT)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 97, (2, 12))
    ids[0, 7] = eos_id
    ids[1, 11] = eos_id
    with torch.no_grad():
        out = hf(torch.from_numpy(ids))
    ref_pooled = out.text_embeds.numpy()

    model = ClipTextEncoder(config=ClipTextConfig(eos_token_id=eos_id, **TXT))
    params = convert_clip_text({k: v.numpy() for k, v in hf.state_dict().items()})
    expected = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    assert_tree_match(expected, params)
    pooled, _ = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, rtol=3e-4, atol=3e-4)


def test_hicom_with_clip_tower_forward():
    """Assembled model with CLIP tower + guide (the clip-vit-large path)."""
    from hicom_tpu.config import HIComConfig, Qwen2Config, tiny_test_config
    from hicom_tpu.constants import VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel

    tiny = tiny_test_config()
    cfg = HIComConfig(
        text_config=tiny.text_config,
        vision_config=ClipVisionConfig(**VIS),
        guide_text_config=ClipTextConfig(**TXT),
        mm_vision_tower="clip-vit-large-patch14-336",  # routing key only
        mm_projector_type="local43_global8",
        use_guide="direct",
        projector_qk_dim=VIS["projection_dim"],
        dtype="float32",
    )
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((1, 4, 3, 56, 56)).astype(np.float32))
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 10))
    ids[0, 2] = VIDEO_TOKEN_INDEX
    gids = jnp.asarray(rng.integers(0, TXT["vocab_size"], (1, 12)))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), frames, guide_ids=gids, modal="video")
    logits, _, _ = model.apply({"params": variables["params"]}, jnp.asarray(ids), frames,
                               guide_ids=gids, modal="video")
    assert bool(jnp.isfinite(logits).all())
    # local43 on t=4 (kt=4 -> 1) spatial 4/3 -> 2x2 = 4 tokens + 8 global
    assert logits.shape[1] == 10 - 1 + 4 + 8
