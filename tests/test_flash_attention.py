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


def test_gqa_grouped_matches_repeated():
    """Grouped attention (einsum + flash) == repeat-KV attention, fwd + bwd."""
    import jax

    from hicom_tpu.ops.flash_attention import flash_attention_gqa

    rng = np.random.default_rng(10)
    b, KVH, g, L, d = 2, 2, 3, 96, 32
    H = KVH * g
    q = jnp.asarray(rng.standard_normal((b, H, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    lens = jnp.asarray([70, 96], jnp.int32)
    gvec = jnp.asarray(rng.standard_normal((b, H, L, d)).astype(np.float32))

    k_rep = jnp.repeat(k, g, axis=1)
    v_rep = jnp.repeat(v, g, axis=1)

    # einsum grouped (sdpa auto-detects head mismatch)
    out_g = sdpa(q, k, v, is_causal=True, kv_lengths=lens, implementation="einsum")
    out_r = sdpa(q, k_rep, v_rep, is_causal=True, kv_lengths=lens, implementation="einsum")
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_r), rtol=2e-5, atol=2e-5)

    # flash grouped (interpret): values + grads
    out_f = flash_attention_gqa(q, k, v, is_causal=True, kv_lengths=lens,
                                block_q=64, block_k=64, interpret=True)
    valid = (jnp.arange(L)[None, :] < lens[:, None])[:, None, :, None]
    np.testing.assert_allclose(np.asarray(jnp.where(valid, out_f, 0)),
                               np.asarray(jnp.where(valid, out_r, 0)), rtol=2e-5, atol=2e-5)

    def loss_f(q, k, v):
        o = flash_attention_gqa(q, k, v, is_causal=True, kv_lengths=lens,
                                block_q=64, block_k=64, interpret=True)
        return jnp.sum(jnp.where(valid, o, 0.0) * gvec)

    def loss_r(q, k, v):
        o = sdpa(q, jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1),
                 is_causal=True, kv_lengths=lens, implementation="einsum")
        return jnp.sum(jnp.where(valid, o, 0.0) * gvec)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=3e-4, atol=3e-4, err_msg=name)


def test_gqa_block_choice_always_lane_legal():
    """Mosaic lowering rule (chip-hit r5 at L=241): the causal GQA q-block
    must be a multiple of 8 (or the >=8-aligned fallback) — the folded array
    has g*L rows, so a divisor of L like L itself is NOT lowerable when
    L % 8 != 0. Also numeric parity at such a prime-ish L via interpret."""
    from hicom_tpu.ops.flash_attention import _aligned_block_q, flash_attention_gqa

    for L in (241, 727, 13, 100, 1446):
        for bq in (64, 128, 256, 512):
            c = _aligned_block_q(L, bq)
            assert c % 8 == 0 or c == bq, (L, bq, c)
            if c != bq:
                assert L % c == 0 and c <= bq

    rng = np.random.default_rng(11)
    b, KVH, g, L, d = 1, 2, 3, 241, 32
    q = jnp.asarray(rng.standard_normal((b, KVH * g, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    out_f = flash_attention_gqa(q, k, v, is_causal=True, block_q=256, block_k=128,
                                interpret=True)
    out_r = sdpa(q, jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1),
                 is_causal=True, implementation="einsum")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=2e-5, atol=2e-5)


def test_gqa_fold_aligned_blocks():
    """L a multiple of block_q: the fold-aware diagonal skip drops blocks but
    the output still matches repeated-KV attention (fwd + bwd)."""
    import jax

    from hicom_tpu.ops.flash_attention import flash_attention_gqa

    rng = np.random.default_rng(11)
    b, KVH, g, L, d = 1, 2, 4, 256, 64  # block_q picker lands on 128|256
    H = KVH * g
    q = jnp.asarray(rng.standard_normal((b, H, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    lens = jnp.asarray([200], jnp.int32)
    gvec = jnp.asarray(rng.standard_normal((b, H, L, d)).astype(np.float32))
    valid = (jnp.arange(L)[None, :] < lens[:, None])[:, None, :, None]

    def loss_f(q, k, v):
        o = flash_attention_gqa(q, k, v, is_causal=True, kv_lengths=lens,
                                block_q=128, block_k=128, interpret=True)
        return jnp.sum(jnp.where(valid, o, 0.0) * gvec)

    def loss_r(q, k, v):
        o = sdpa(q, jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1),
                 is_causal=True, kv_lengths=lens, implementation="einsum")
        return jnp.sum(jnp.where(valid, o, 0.0) * gvec)

    of, gf = jax.value_and_grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    orr, gr = jax.value_and_grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(of), float(orr), rtol=2e-5)
    for a, bb, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=3e-4, atol=3e-4, err_msg=name)


def test_fused_tile_attention_matches_xla_path():
    """Fused local-compression kernel == tile_thw + sdpa (fp32 softmax),
    including the SigLIP clip-scale variant."""
    import math

    from hicom_tpu.ops.grouping import tile_thw
    from hicom_tpu.ops.local_attn import fused_tile_attention

    rng = np.random.default_rng(20)
    t, h, w, qk, dv = 8, 9, 9, 64, 48
    kt, kh, kw = 4, 3, 3
    key = jnp.asarray(rng.standard_normal((t, h, w, qk)).astype(np.float32))
    val = jnp.asarray(rng.standard_normal((t, h, w, dv)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((t // kt, h // kh, w // kw, qk)).astype(np.float32))

    for scale, bias in ((1.0 / math.sqrt(qk), 0.0), (jnp.float32(1.7), jnp.float32(-0.3))):
        rk = tile_thw(key, (kt, kh, kw))
        rv = tile_thw(val, (kt, kh, kw))
        ref = sdpa(q.reshape(-1, 1, qk), rk, rv, scale=scale, logit_bias=bias,
                   implementation="einsum").reshape(t // kt, h // kh, w // kw, dv)
        got = fused_tile_attention(q, key, val, (kt, kh, kw), scale, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_local_compressor_fused_env_matches_default(monkeypatch):
    """HICOM_FUSED_LOCAL=interpret routes LocalCompressor through the fused
    kernel with identical outputs."""
    import jax

    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.models.projector import HIComProjector

    cfg = tiny_test_config()  # vision 56/14 → 4x4 grid, local43 (h=4 NOT /3 → xla)
    # use a grid that divides: mimic so400m-like h=w=9 by calling the projector
    # on synthetic features with t=8, h=w=9? grid is h=w from the tower; the
    # projector itself only sees (t, h, w, d) — feed a divisible volume.
    model = HIComProjector(config=cfg)
    rng = np.random.default_rng(21)
    ff = jnp.asarray(rng.standard_normal((8, 9, 9, cfg.mm_hidden_size)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), ff, None, None, "video")

    monkeypatch.delenv("HICOM_FUSED_LOCAL", raising=False)
    ref = model.apply(variables, ff, None, None, "video")
    monkeypatch.setenv("HICOM_FUSED_LOCAL", "interpret")
    got = model.apply(variables, ff, None, None, "video")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_causal_alignment_q_ne_k_matches_einsum():
    """is_causal with Lq != Lk: flash (plain + GQA) matches the einsum path's
    bottom-right-aligned diagonal (tril offset k = Lk - Lq)."""
    from hicom_tpu.ops.flash_attention import flash_attention_gqa

    rng = np.random.default_rng(30)
    bh, Lq, Lk, d = 2, 64, 192, 32
    q = jnp.asarray(rng.standard_normal((bh, Lq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, Lk, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, Lk, d)).astype(np.float32))
    ref = sdpa(q, k, v, is_causal=True, implementation="einsum")
    got = flash_attention(q, k, v, is_causal=True, block_q=32, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # grouped variant, kv longer than q per fold
    b, KVH, g = 1, 2, 2
    H = KVH * g
    qg = jnp.asarray(rng.standard_normal((b, H, Lq, d)).astype(np.float32))
    kg = jnp.asarray(rng.standard_normal((b, KVH, Lk, d)).astype(np.float32))
    vg = jnp.asarray(rng.standard_normal((b, KVH, Lk, d)).astype(np.float32))
    ref_g = sdpa(qg, kg, vg, is_causal=True, implementation="einsum")
    got_g = flash_attention_gqa(qg, kg, vg, is_causal=True, block_q=32, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), rtol=2e-5, atol=2e-5)


def test_grouped_einsum_per_head_mask():
    """A (b, H, Q, K) per-head mask survives the grouped-einsum reshaping."""
    rng = np.random.default_rng(31)
    b, KVH, g, L, d = 1, 2, 2, 16, 8
    H = KVH * g
    q = jnp.asarray(rng.standard_normal((b, H, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, H, L, L)) > 0.3)
    mask = mask.at[..., 0].set(True)  # no fully-masked rows
    ref = sdpa(q, jnp.repeat(k, g, 1), jnp.repeat(v, g, 1), mask=mask, implementation="einsum")
    got = sdpa(q, k, v, mask=mask, implementation="einsum")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_vmapped_flash_with_kv_lengths():
    """pallas batching rule: vmapping the kernel must keep per-row kv_lengths
    associated with the right rows (regression guard for the program_id row
    index under an added batch grid dim)."""
    import jax

    from hicom_tpu.ops.attention import sdpa

    rng = np.random.default_rng(3)
    B, R, L, D = 3, 2, 64, 32
    q = jnp.asarray(rng.standard_normal((B, R, L, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, R, L, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, R, L, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(10, L, (B, R)), jnp.int32)
    f = jax.vmap(lambda q, k, v, l: flash_attention(
        q, k, v, kv_lengths=l, block_q=32, block_k=32, interpret=True))
    e = jax.vmap(lambda q, k, v, l: sdpa(q, k, v, kv_lengths=l, implementation="einsum"))
    np.testing.assert_allclose(np.asarray(f(q, k, v, lens)), np.asarray(e(q, k, v, lens)),
                               rtol=2e-5, atol=2e-5)


def test_fullblock_fold_kernel_matches_einsum():
    """The unmasked single-block fast path (_fullblock_fwd, HEADFOLD cells —
    the SigLIP/CLIP tower shape) matches the einsum path fwd + bwd; fold
    respects non-divisible row counts."""
    import jax

    from hicom_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    for bh in (8, 6):  # 6 % 4 != 0 -> fold steps down to 2
        q = jnp.asarray(rng.standard_normal((bh, 93, 72)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((bh, 93, 72)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((bh, 93, 72)), jnp.float32)
        out, lse = fa._fullblock_fwd(q, k, v, 72**-0.5, 0.0, True)
        ref = sdpa(q, k, v, implementation="einsum")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
        # lse parity vs log-sum-exp of the actual logits
        logits = np.einsum("bqd,bkd->bqk", np.asarray(q), np.asarray(k)) * 72**-0.5
        ref_lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
        np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=1e-4, atol=1e-4)

    # the public entry routes the tower shape through the fast path, grads too
    q = jnp.asarray(rng.standard_normal((4, 81, 72)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 81, 72)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 81, 72)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((4, 81, 72)), jnp.float32)

    def f_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=1024, block_k=1024, interpret=True)
        return jnp.sum(o * g)

    def f_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, implementation="einsum") * g)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
