"""Flash attention kernel vs the einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hicom_tpu.ops.attention import sdpa
from hicom_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "q_len,kv_len,causal",
    [
        (256, 256, False),
        (256, 256, True),
        (100, 100, True),  # non-divisible by block
        (37, 729, False),  # cross attention
        (300, 300, True),  # multiple blocks with diagonal
        (1, 200, False),  # single-query decode shape
    ],
)
def test_flash_matches_sdpa(q_len, kv_len, causal):
    rng = np.random.default_rng(0)
    bh, d = 2, 64
    q = jnp.asarray(rng.standard_normal((bh, q_len, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, kv_len, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, kv_len, d)).astype(np.float32))
    ref = sdpa(q, k, v, is_causal=causal)
    got = flash_attention(q, k, v, is_causal=causal, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_logit_bias():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 96, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 96, 32)).astype(np.float32))
    ref = sdpa(q, k, v, scale=0.7, logit_bias=-1.3)
    got = flash_attention(q, k, v, scale=0.7, logit_bias=-1.3, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("q_len,kv_len,causal", [(128, 128, True), (100, 100, True), (64, 200, False)])
def test_flash_backward_matches_einsum_grad(q_len, kv_len, causal):
    import jax

    rng = np.random.default_rng(5)
    bh, d = 2, 32
    q = jnp.asarray(rng.standard_normal((bh, q_len, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, kv_len, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, kv_len, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((bh, q_len, d)).astype(np.float32))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, is_causal=causal, block_q=64, block_k=64, interpret=True)
        return jnp.sum(o * g)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, is_causal=causal) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name)


def test_flash_forward_value_unchanged_with_vjp():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((1, 100, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 150, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 150, 32)).astype(np.float32))
    ref = sdpa(q, k, v, scale=0.5, logit_bias=0.3)
    got = flash_attention(q, k, v, scale=0.5, logit_bias=0.3, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_kv_lengths_matches_dense_mask():
    """Per-row kv lengths (right padding) vs explicit dense mask, fwd + bwd."""
    import jax

    rng = np.random.default_rng(8)
    b, h, L, d = 2, 2, 96, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    lens = jnp.asarray([60, 96], jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))

    kv_pos = jnp.arange(L)[None, None, None, :]
    q_pos = jnp.arange(L)[None, None, :, None]
    dense = (kv_pos <= q_pos) & (kv_pos < lens[:, None, None, None])

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, is_causal=True, kv_lengths=lens,
                            block_q=32, block_k=32, interpret=True)
        valid = (jnp.arange(L)[None, :] < lens[:, None])[:, None, :, None]
        return jnp.sum(jnp.where(valid, o, 0.0) * g)

    def loss_ref(q, k, v):
        o = sdpa(q, k, v, mask=dense)
        valid = (jnp.arange(L)[None, :] < lens[:, None])[:, None, :, None]
        return jnp.sum(jnp.where(valid, o, 0.0) * g)

    of = flash_attention(q, k, v, is_causal=True, kv_lengths=lens, block_q=32, block_k=32, interpret=True)
    oe = sdpa(q, k, v, mask=dense)
    valid = (jnp.arange(L)[None, :] < lens[:, None])[:, None, :, None]
    np.testing.assert_allclose(np.asarray(jnp.where(valid, of, 0)), np.asarray(jnp.where(valid, oe, 0)),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4, err_msg=name)
