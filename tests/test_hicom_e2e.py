"""End-to-end tests of the assembled HICom model on the tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hicom_tpu.config import tiny_test_config
from hicom_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from hicom_tpu.models.generate import generate_tokens
from hicom_tpu.models.hicom import HIComModel
from hicom_tpu.models.splice import splice_visual_embeds


def make_model(**overrides):
    cfg = tiny_test_config(**overrides)
    model = HIComModel(config=cfg)
    return cfg, model


def make_inputs(cfg, b=2, t=4, L=12, guide=False, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vision_config.image_size
    frames = rng.standard_normal((b, t, 3, img, img)).astype(np.float32)
    ids = rng.integers(5, cfg.text_config.vocab_size, (b, L))
    ids[:, 3] = VIDEO_TOKEN_INDEX  # sentinel at position 3
    out = dict(frames=jnp.asarray(frames), input_ids=jnp.asarray(ids))
    if guide:
        out["guide_ids"] = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (b, 8)))
    return out


def test_forward_shapes_and_token_count():
    cfg, model = make_model()
    x = make_inputs(cfg)
    variables = model.init(jax.random.PRNGKey(0), x["input_ids"], x["frames"], modal="video")
    logits, labels, mask = model.apply(
        {"params": variables["params"]}, x["input_ids"], x["frames"], modal="video"
    )
    bound = model.bind(variables)
    V = bound.visual_token_count(4, "video")
    # local43 on (4, 4, 4): t'=1, 2x2 spatial = 4 tokens; + 32 global queries
    assert V == 4 + 32
    assert logits.shape == (2, 12 - 1 + V, cfg.text_config.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_forward_with_guide_direct():
    cfg, model = make_model(use_guide="direct")
    x = make_inputs(cfg, guide=True)
    variables = model.init(
        jax.random.PRNGKey(0), x["input_ids"], x["frames"], guide_ids=x["guide_ids"], modal="video"
    )
    logits, _, _ = model.apply(
        {"params": variables["params"]}, x["input_ids"], x["frames"],
        guide_ids=x["guide_ids"], modal="video",
    )
    assert bool(jnp.isfinite(logits).all())


def test_mean_pool_projector_path():
    cfg, model = make_model(mm_projector_type="mlp2x_gelu")
    x = make_inputs(cfg)
    variables = model.init(jax.random.PRNGKey(0), x["input_ids"], x["frames"], modal="video")
    logits, _, _ = model.apply({"params": variables["params"]}, x["input_ids"], x["frames"], modal="video")
    # video: (4, ceil(4/2), ceil(4/2)) = 16 tokens
    assert logits.shape[1] == 12 - 1 + 16


def test_splice_semantics():
    """Splice must reproduce the reference's insert-at-sentinel layout."""
    rng = np.random.default_rng(1)
    L, V, D = 7, 3, 4
    ids = np.array([[5, 6, VIDEO_TOKEN_INDEX, 7, 8, 0, 0], [9, 4, 3, 2, 1, 6, 5]])
    text = rng.standard_normal((2, L, D)).astype(np.float32)
    vis = rng.standard_normal((2, V, D)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1, 1]], dtype=bool)
    labels = np.where(mask, ids, IGNORE_INDEX)

    out = splice_visual_embeds(
        jnp.asarray(ids), jnp.asarray(text), jnp.asarray(vis), jnp.asarray(mask), jnp.asarray(labels)
    )
    e = np.asarray(out.embeds)
    # row 0: text[0:2], visual[0:3], text[3:5], then padding
    np.testing.assert_allclose(e[0, :2], text[0, :2])
    np.testing.assert_allclose(e[0, 2:5], vis[0])
    np.testing.assert_allclose(e[0, 5:7], text[0, 3:5])
    np.testing.assert_allclose(e[0, 7:], 0.0)  # masked tail zeroed
    m = np.asarray(out.attention_mask)
    assert m[0].tolist() == [True] * 7 + [False, False]
    lab = np.asarray(out.labels)
    assert lab[0, 2:5].tolist() == [IGNORE_INDEX] * 3
    assert lab[0, 5] == 7 and lab[0, 6] == 8 and lab[0, 7] == IGNORE_INDEX
    # row 1: no sentinel → text kept, tail padded
    np.testing.assert_allclose(e[1, :7], text[1])
    assert m[1].tolist() == [True] * 7 + [False, False]
    assert lab[1, 7] == IGNORE_INDEX


def test_generate_matches_rolling_forward():
    """Greedy generate (prefill+cache loop) == argmax over repeated full forwards."""
    cfg, model = make_model()
    x = make_inputs(cfg, b=1, L=8, seed=3)
    variables = model.init(jax.random.PRNGKey(0), x["input_ids"], x["frames"], modal="video")
    params = {"params": variables["params"]}

    max_new = 4
    out = generate_tokens(
        params, x["input_ids"], x["frames"], None, None, jax.random.PRNGKey(1),
        model=model, modal="video", max_new_tokens=max_new, eos_token_id=cfg.text_config.eos_token_id,
        cache_len=128, has_frames=True,
    )
    out = np.asarray(out)[0]

    # rolling reference: repeatedly full-forward with appended tokens
    ids = np.asarray(x["input_ids"])
    toks = []
    cur = ids
    for _ in range(max_new):
        logits, _, mask = model.apply(params, jnp.asarray(cur), x["frames"], modal="video")
        last = int(np.sum(np.asarray(mask)[0])) - 1
        tok = int(np.argmax(np.asarray(logits)[0, last]))
        toks.append(tok)
        if tok == cfg.text_config.eos_token_id:
            break
        cur = np.concatenate([cur, [[tok]]], axis=1)

    expect = toks + [cfg.text_config.eos_token_id] * (max_new - len(toks))
    assert out.tolist() == expect, (out.tolist(), expect)


def test_generate_text_only():
    cfg, model = make_model()
    x = make_inputs(cfg, b=1, L=6, seed=4)
    ids = np.array(x["input_ids"])
    ids[ids < 0] = 5  # strip sentinel
    variables = model.init(jax.random.PRNGKey(0), x["input_ids"], x["frames"], modal="video")
    out = generate_tokens(
        {"params": variables["params"]}, jnp.asarray(ids), None, None, None, jax.random.PRNGKey(1),
        model=model, modal="text", max_new_tokens=3, eos_token_id=cfg.text_config.eos_token_id,
        cache_len=64, has_frames=False,
    )
    assert np.asarray(out).shape == (1, 3)
