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


def test_generate_keyword_stopping():
    """``stop_sequences`` ends generation when the generated tail matches a
    keyword's token ids (KeywordsStoppingCriteria, reference mm_utils.py:684-715)."""
    cfg, model = make_model()
    x = make_inputs(cfg, b=1, L=8, seed=3)
    variables = model.init(jax.random.PRNGKey(0), x["input_ids"], x["frames"], modal="video")
    params = {"params": variables["params"]}
    eos = cfg.text_config.eos_token_id
    kw = dict(model=model, modal="video", max_new_tokens=6, eos_token_id=eos,
              cache_len=128, has_frames=True)

    base = np.asarray(generate_tokens(params, x["input_ids"], x["frames"], None, None,
                                      jax.random.PRNGKey(1), **kw))[0]
    assert eos not in base[:3].tolist()  # need 3 real tokens to test against

    # two-token keyword = generated tokens 1..2 → stop right after emitting them
    seq = (int(base[1]), int(base[2]))
    out = np.asarray(generate_tokens(params, x["input_ids"], x["frames"], None, None,
                                     jax.random.PRNGKey(1), **kw, stop_sequences=(seq,)))[0]
    assert out.tolist() == base[:3].tolist() + [eos] * (len(base) - 3)

    # single-token keyword matching the first generated token stops at step 0
    out0 = np.asarray(generate_tokens(params, x["input_ids"], x["frames"], None, None,
                                      jax.random.PRNGKey(1), **kw,
                                      stop_sequences=((int(base[0]),),)))[0]
    assert out0.tolist() == [int(base[0])] + [eos] * (len(base) - 1)


def test_keyword_token_sequences_strips_bos():
    from hicom_tpu.models.generate import keyword_token_sequences

    class Tok:
        bos_token_id = 1

        def __call__(self, s):
            r = type("R", (), {})()
            r.input_ids = {"</s>": [1, 2], "###": [1, 9, 9], "": []}[s]
            return r

    assert keyword_token_sequences(["</s>", "###", ""], Tok()) == ((2,), (9, 9))


def test_generate_batched_right_padding_matches_single():
    """Rows of different prompt lengths in one right-padded batch must match
    per-row unpadded generation (cache validity bitmap correctness)."""
    cfg, model = make_model()
    rng = np.random.default_rng(7)
    img = cfg.vision_config.image_size
    frames = rng.standard_normal((2, 4, 3, img, img)).astype(np.float32)
    ids_a = rng.integers(5, cfg.text_config.vocab_size, (1, 6))
    ids_a[0, 1] = VIDEO_TOKEN_INDEX
    ids_b = rng.integers(5, cfg.text_config.vocab_size, (1, 9))
    ids_b[0, 1] = VIDEO_TOKEN_INDEX

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_b), jnp.asarray(frames[1:]), modal="video")
    params = {"params": variables["params"]}
    eos = cfg.text_config.eos_token_id
    kw = dict(model=model, modal="video", max_new_tokens=4, eos_token_id=eos, cache_len=128, has_frames=True)

    out_a = np.asarray(generate_tokens(params, jnp.asarray(ids_a), jnp.asarray(frames[:1]), None, None,
                                       jax.random.PRNGKey(1), **kw))
    out_b = np.asarray(generate_tokens(params, jnp.asarray(ids_b), jnp.asarray(frames[1:]), None, None,
                                       jax.random.PRNGKey(1), **kw))

    # batch: right-pad row a to length 9 with pad id, attention mask marks pads
    pad = np.full((1, 3), 0, dtype=ids_a.dtype)
    ids_batch = np.concatenate([np.concatenate([ids_a, pad], axis=1), ids_b], axis=0)
    mask = np.ones((2, 9), dtype=bool)
    mask[0, 6:] = False

    from hicom_tpu.models.generate import generate_tokens as gt

    def run_batched(m_, params_):
        import jax as _jax

        def run(m):
            visual = m.encode_visual(jnp.asarray(frames), None, "video")
            spliced = m.embed_and_splice(jnp.asarray(ids_batch), visual, jnp.asarray(mask))
            return spliced

        return None

    # use the public generate path with attention mask via embed_and_splice:
    # generate_tokens derives the mask internally from input_ids; emulate by
    # replacing pads with a real token id but masking... instead test the
    # splice+prefill path directly:
    from hicom_tpu.models.qwen2 import KVCache

    def prefill_and_decode(params):
        def run(m):
            visual = m.encode_visual(jnp.asarray(frames), None, "video")
            spliced = m.embed_and_splice(jnp.asarray(ids_batch), visual, jnp.asarray(mask))
            tc = cfg.text_config
            cache = KVCache.zeros(tc.num_hidden_layers, 2, tc.num_key_value_heads, 128, tc.head_dim, jnp.float32)
            hidden, cache = m.language_model.model(spliced.embeds, spliced.positions, cache,
                                                   padding_mask=spliced.attention_mask)
            true_len = jnp.sum(spliced.attention_mask.astype(jnp.int32), axis=1)
            last = jnp.take_along_axis(hidden, (true_len - 1)[:, None, None], axis=1)
            logits = m.language_model.logits(last)[:, 0]
            toks = [jnp.argmax(logits, axis=-1)]
            for step in range(1, 4):
                embeds = m.language_model.embed(toks[-1][:, None])
                positions = (true_len + step - 1)[:, None]
                hidden, cache = m.language_model.model(embeds, positions, cache)
                toks.append(jnp.argmax(m.language_model.logits(hidden)[:, 0], axis=-1))
            return jnp.stack(toks, axis=1)

        return model.apply(params, method=run)

    out_batch = np.asarray(prefill_and_decode(params))

    def until_eos(seq):
        seq = list(seq)
        return seq[: seq.index(eos) + 1] if eos in seq else seq

    assert until_eos(out_batch[0]) == until_eos(out_a[0][:4].tolist()) or out_batch[0].tolist() == out_a[0][:4].tolist()
    assert out_batch[1].tolist() == out_b[0][:4].tolist()


def test_multi_sentinel_splice():
    """K-sentinel splice: equivalent to single-sentinel for K=1; correct layout for K=2."""
    from hicom_tpu.models.splice import splice_visual_embeds_multi

    rng = np.random.default_rng(9)
    L, V, D = 9, 3, 4
    ids = np.array([
        [5, VIDEO_TOKEN_INDEX, 6, -200, 7, 8, 0, 0, 0],  # two media
        [5, 6, VIDEO_TOKEN_INDEX, 7, 8, 9, 3, 0, 0],     # one medium
    ])
    mask = np.array([[1]*6 + [0]*3, [1]*7 + [0]*2], dtype=bool)
    text = rng.standard_normal((2, L, D)).astype(np.float32)
    vis = rng.standard_normal((2, 2, V, D)).astype(np.float32)
    labels = np.where(mask, np.abs(ids), IGNORE_INDEX)

    out = splice_visual_embeds_multi(
        jnp.asarray(ids), jnp.asarray(text), jnp.asarray(vis), jnp.asarray(mask), jnp.asarray(labels)
    )
    e = np.asarray(out.embeds)
    m = np.asarray(out.attention_mask)
    lab = np.asarray(out.labels)
    out_len = L + 2 * (V - 1)

    # row 0: t0, vis0(3), t2, vis1(3), t4, t5 then padding
    np.testing.assert_allclose(e[0, 0], text[0, 0])
    np.testing.assert_allclose(e[0, 1:4], vis[0, 0])
    np.testing.assert_allclose(e[0, 4], text[0, 2])
    np.testing.assert_allclose(e[0, 5:8], vis[0, 1])
    np.testing.assert_allclose(e[0, 8], text[0, 4])
    np.testing.assert_allclose(e[0, 9], text[0, 5])
    assert m[0].tolist() == [True]*10 + [False]*(out_len-10)
    assert lab[0, 1:4].tolist() == [IGNORE_INDEX]*3
    assert lab[0, 8] == 7 and lab[0, 9] == 8

    # row 1: one sentinel → text[0:2], vis[1,0], text[3:7]; surplus visual dropped
    np.testing.assert_allclose(e[1, :2], text[1, :2])
    np.testing.assert_allclose(e[1, 2:5], vis[1, 0])
    np.testing.assert_allclose(e[1, 5:9], text[1, 3:7])
    assert m[1].tolist() == [True]*9 + [False]*(out_len-9)

    # K=1 equivalence with the single-sentinel splice
    ids1 = np.array([[5, 6, VIDEO_TOKEN_INDEX, 7, 8]])
    text1 = rng.standard_normal((1, 5, D)).astype(np.float32)
    vis1 = rng.standard_normal((1, 1, V, D)).astype(np.float32)
    multi = splice_visual_embeds_multi(jnp.asarray(ids1), jnp.asarray(text1), jnp.asarray(vis1))
    single = splice_visual_embeds(jnp.asarray(ids1), jnp.asarray(text1), jnp.asarray(vis1[:, 0]))
    np.testing.assert_allclose(np.asarray(multi.embeds), np.asarray(single.embeds))
    np.testing.assert_array_equal(np.asarray(multi.attention_mask), np.asarray(single.attention_mask))


def test_multi_image_forward_path():
    """K images per row, K sentinels: per-image encoding + K-sentinel splice."""
    cfg, model = make_model()
    rng = np.random.default_rng(11)
    img = cfg.vision_config.image_size
    K = 2
    frames = jnp.asarray(rng.standard_normal((2, K, 3, img, img)).astype(np.float32))
    ids = rng.integers(5, cfg.text_config.vocab_size, (2, 12))
    ids[0, 1] = -200
    ids[0, 4] = -200  # two images row 0
    ids[1, 2] = -200  # one image row 1 (surplus visual ignored)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), frames, modal="image", multi_image=True)
    logits, labels, mask = model.apply(
        {"params": variables["params"]}, jnp.asarray(ids), frames, modal="image", multi_image=True
    )
    bound = model.bind(variables)
    V = bound.visual_token_count(1, "image")
    assert logits.shape[1] == 12 + K * (V - 1)
    assert bool(jnp.isfinite(logits).all())


def test_top_p_sampling_cutoff():
    """top-p keeps the minimal prefix of sorted probs whose mass reaches p."""
    import jax

    from hicom_tpu.models.generate import sample_token

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    # p=0.7: keep tokens 0,1 (0.5+0.3 >= 0.7); tokens 2,3 must never appear
    seen = set()
    for i in range(200):
        tok = int(sample_token(logits, jax.random.PRNGKey(i), temperature=1.0, top_p=0.7)[0])
        seen.add(tok)
    assert seen <= {0, 1}, seen
    assert seen == {0, 1}

    # p→0 degenerates to greedy; temperature=0 is argmax
    tok = int(sample_token(logits, jax.random.PRNGKey(0), temperature=1.0, top_p=0.01)[0])
    assert tok == 0
    assert int(sample_token(logits, jax.random.PRNGKey(1), temperature=0.0, top_p=0.9)[0]) == 0


def test_multi_splice_surplus_sentinels_masked():
    """Rows with more sentinels than K: scatters stay in-bounds, text order is
    preserved, and surplus sentinel positions are masked out (no silent drops)."""
    import jax.numpy as jnp

    from hicom_tpu.constants import VIDEO_TOKEN_INDEX
    from hicom_tpu.models.splice import splice_visual_embeds_multi

    rng = np.random.default_rng(12)
    D, V, K = 8, 3, 1
    ids = np.array([[5, VIDEO_TOKEN_INDEX, 6, VIDEO_TOKEN_INDEX, 7]])  # 2 sentinels, K=1
    text = rng.standard_normal((1, 5, D)).astype(np.float32)
    vis = rng.standard_normal((1, K, V, D)).astype(np.float32)
    out = splice_visual_embeds_multi(jnp.asarray(ids), jnp.asarray(text), jnp.asarray(vis))
    out_len = 5 + K * (V - 1)
    assert out.embeds.shape == (1, out_len, D)
    e, m = np.asarray(out.embeds), np.asarray(out.attention_mask)
    # layout: [t0, vis(3), t2, SURPLUS(masked), t4]
    np.testing.assert_allclose(e[0, 0], text[0, 0])
    np.testing.assert_allclose(e[0, 1:4], vis[0, 0])
    np.testing.assert_allclose(e[0, 4], text[0, 2])
    assert not m[0, 5]  # surplus sentinel position masked
    np.testing.assert_allclose(e[0, 5], 0.0)  # and zeroed
    np.testing.assert_allclose(e[0, 6], text[0, 4])
    assert m[0, [0, 1, 2, 3, 4, 6]].all()
