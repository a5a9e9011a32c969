"""Prompt-lookup speculative decoding: exact greedy parity + acceptance.

The spec loop (models/generate.py:_spec_loop) must emit EXACTLY the plain
one-token greedy loop's tokens under every stopping mode — speculation is a
scheduling optimization, never a numerics one. The reference has no serving
layer at all (SURVEY §1: eval loops HF ``generate`` one request at a time,
``hicom/__init__.py:40-121``); this is a beyond-reference capability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hicom_tpu.config import tiny_test_config
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
from hicom_tpu.models.generate import _pld_draft, generate_tokens
from hicom_tpu.models.hicom import HIComModel


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(7)
    img = cfg.vision_config.image_size
    frames = jnp.asarray(rng.standard_normal((1, 4, 3, img, img)).astype(np.float32))
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 10))
    ids[0, 3] = VIDEO_TOKEN_INDEX
    ids = jnp.asarray(ids)
    variables = model.init(jax.random.PRNGKey(0), ids, frames, modal="video")
    return cfg, model, {"params": variables["params"]}, ids, frames


def gen(tiny, spec_k, max_new=24, eos=None, stops=(), stats=False):
    cfg, model, params, ids, frames = tiny
    out = generate_tokens(
        params, ids, frames, None, None, jax.random.PRNGKey(1),
        model=model, modal="video", max_new_tokens=max_new,
        eos_token_id=cfg.text_config.eos_token_id if eos is None else eos,
        cache_len=128, has_frames=True, stop_sequences=stops,
        spec_k=spec_k, return_stats=stats,
    )
    if stats:
        return np.asarray(out[0]), int(out[1])
    return np.asarray(out)


def test_spec_greedy_parity(tiny):
    base = gen(tiny, spec_k=0)
    for k in (1, 3, 4):
        np.testing.assert_array_equal(gen(tiny, spec_k=k), base, err_msg=f"spec_k={k}")


def test_spec_parity_with_eos_mid_stream(tiny):
    # force an eos the model actually emits: the 3rd token of the base run
    base = gen(tiny, spec_k=0)
    eos = int(base[0, 2])
    a = gen(tiny, spec_k=0, eos=eos)
    b = gen(tiny, spec_k=4, eos=eos)
    np.testing.assert_array_equal(b, a)
    assert a[0, 2] == eos and (a[0, 3:] == eos).all()  # stopped there


def test_spec_parity_with_keyword_stop(tiny):
    base = gen(tiny, spec_k=0)
    stops = ((int(base[0, 1]), int(base[0, 2])),)  # 2-token keyword hit at step 2
    a = gen(tiny, spec_k=0, stops=stops)
    b = gen(tiny, spec_k=3, stops=stops)
    np.testing.assert_array_equal(b, a)
    eos = tiny[0].text_config.eos_token_id
    assert (a[0, 3:] == eos).all()


def test_spec_accepts_on_repetitive_continuations(tiny):
    """On a long greedy rollout a tiny random model falls into a cycle; the
    n-gram lookup must then accept drafts, finishing in fewer verify
    iterations than tokens. (Parity is asserted by the tests above; this
    pins that the accept path actually engages.)"""
    base = gen(tiny, spec_k=0, max_new=48)
    out, iters = gen(tiny, spec_k=4, max_new=48, stats=True)
    np.testing.assert_array_equal(out, base)
    n_tokens = out.shape[1]
    assert iters < n_tokens, (iters, n_tokens)  # >1 token/iteration somewhere


def test_spec_ignored_for_batched_or_sampled():
    """spec_k silently degrades to the plain loop for b>1 / sampling."""
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(3)
    img = cfg.vision_config.image_size
    frames = jnp.asarray(rng.standard_normal((2, 4, 3, img, img)).astype(np.float32))
    ids = rng.integers(5, cfg.text_config.vocab_size, (2, 9))
    ids[:, 2] = VIDEO_TOKEN_INDEX
    ids = jnp.asarray(ids)
    variables = model.init(jax.random.PRNGKey(0), ids[:1], frames[:1], modal="video")
    params = {"params": variables["params"]}
    a = generate_tokens(params, ids, frames, None, None, jax.random.PRNGKey(1),
                        model=model, modal="video", max_new_tokens=6,
                        eos_token_id=cfg.text_config.eos_token_id,
                        cache_len=128, has_frames=True, spec_k=0)
    b = generate_tokens(params, ids, frames, None, None, jax.random.PRNGKey(1),
                        model=model, modal="video", max_new_tokens=6,
                        eos_token_id=cfg.text_config.eos_token_id,
                        cache_len=128, has_frames=True, spec_k=4)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_pld_draft_lookup():
    """Draft = continuation of the most recent n-gram match."""
    #        0  1  2  3  4  5  6  7  8
    hist = jnp.asarray([9, 5, 6, 7, 8, 2, 5, 6, 0, 0, 0, 0], jnp.int32)
    # history length 8 → tail (ngram=2) = [2, 5]... use hist_len=8: tail=[5,6]@(6,7)
    draft = _pld_draft(hist, jnp.int32(8), ngram=2, k=3)
    # most recent earlier [5, 6] is at (1, 2) → continuation hist[3:6] = [7, 8, 2]
    assert np.asarray(draft).tolist() == [7, 8, 2]
    # no match → zeros-backed draft (never accepted, still well-formed)
    none = _pld_draft(jnp.asarray([1, 2, 3, 4, 0, 0], jnp.int32), jnp.int32(4), ngram=2, k=2)
    assert np.asarray(none).shape == (2,)
