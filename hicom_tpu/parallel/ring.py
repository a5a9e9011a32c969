"""Ring attention: exact attention over a sequence sharded across devices.

The building block for prefilling sequences far beyond one chip's HBM
(blockwise/ring attention à la Liu et al.; the reference has no long-context
story at all — SURVEY.md §2.3/§5). Each device holds contiguous q/k/v chunks
of the global sequence; KV chunks rotate around the ring with
``lax.ppermute`` while a running online softmax (m, l, acc) accumulates in
fp32 — the full (L, L) logits never exist anywhere, and peak memory per chip
is O(L_local).

Designed to be called inside ``shard_map``. Supports causal masking with
global positions, GQA q/kv head ratios (grouped einsum, no repeated KV), and
right-padded KV via per-row global lengths. Compute for fully-masked blocks
is skipped with ``lax.cond`` (causal ring does ~half the ring steps' work).

Used standalone for decoder prefill when [visual; text] prompts outgrow one
chip; the compressor path uses the cheaper stats-merge in long_video.py
(tiny query count → no ring needed).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def ring_attention(
    q: Array,  # (b, H, Lq_loc, d) — this device's query chunk
    k: Array,  # (b, KVH, Lk_loc, d) — this device's kv chunk
    v: Array,
    axis_name: str,
    *,
    scale: Optional[float] = None,
    is_causal: bool = False,
    kv_lengths: Optional[Array] = None,  # (b,) GLOBAL valid kv length
) -> Array:
    """Exact attention with q and kv sequence axes sharded over ``axis_name``.

    Global sequence = concatenation of chunks in axis-index order; causal and
    length masks are evaluated at global positions. Output is this device's
    (b, H, Lq_loc, d) chunk. H must be a multiple of KVH (GQA folds queries
    into groups; KV is never materialized repeated).
    """
    b, H, Lq, d = q.shape
    KVH, Lk = k.shape[1], k.shape[2]
    assert H % KVH == 0
    g = H // KVH
    if scale is None:
        scale = 1.0 / (d**0.5)

    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * Lq + jnp.arange(Lq)  # (Lq,) global positions
    qg = q.reshape(b, KVH, g, Lq, d)

    neg = jnp.finfo(jnp.float32).min

    # the running stats must be device-varying from the start so both
    # lax.cond branches (skip vs compute) agree on the manual-axes type
    def _vary(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis_name, to="varying")
        return jax.lax.pvary(x, axis_name)

    m0 = _vary(jnp.full((b, KVH, g, Lq, 1), neg, jnp.float32))
    l0 = _vary(jnp.zeros((b, KVH, g, Lq, 1), jnp.float32))
    acc0 = _vary(jnp.zeros((b, KVH, g, Lq, d), jnp.float32))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def block(carry_k, carry_v, src, m, l, acc):
        k_pos = src * Lk + jnp.arange(Lk)  # (Lk,) global positions
        logits = jnp.einsum(
            "bkgqd,bksd->bkgqs", qg, carry_k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * scale
        mask = jnp.ones((Lq, Lk), bool)
        if is_causal:
            mask = k_pos[None, :] <= q_pos[:, None]
        if kv_lengths is not None:
            lmask = k_pos[None, None, :] < kv_lengths[:, None, None]  # (b, 1, Lk)
            logits = jnp.where(lmask[:, None, None], logits, neg)
        logits = jnp.where(mask, logits, neg)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bkgqs,bksd->bkgqd", p.astype(carry_v.dtype), carry_v,
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        return m_new, l_new, acc_new

    def step(s, carry):
        ck, cv, m, l, acc = carry
        src = (idx - s) % n  # whose chunk we hold at step s
        if is_causal:
            # skip chunks entirely above the diagonal (global block bounds)
            run = src * Lk <= idx * Lq + Lq - 1
            m, l, acc = jax.lax.cond(
                run,
                lambda a: block(ck, cv, src, *a),
                lambda a: a,
                (m, l, acc),
            )
        else:
            m, l, acc = block(ck, cv, src, m, l, acc)
        # rotate so next step holds the previous ring neighbour's chunk
        ck = jax.lax.ppermute(ck, axis_name, perm)
        cv = jax.lax.ppermute(cv, axis_name, perm)
        return ck, cv, m, l, acc

    _, _, m, l, acc = jax.lax.fori_loop(0, n, step, (k, v, m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(b, H, Lq, d).astype(q.dtype)


def ring_prefill(
    model,
    params,
    embeds: Array,  # (b, S, D) spliced [visual; text] embeddings, UNPADDED
    positions: Array,  # (b, S) rope positions (arange for unpadded prompts)
    mesh,
    axis: str = "dp",
    cache_len: Optional[int] = None,
):
    """Decoder prefill with the sequence axis sharded over mesh axis ``axis``.

    The production entry for prompts beyond one prefill bucket / one chip's
    HBM (e.g. hundreds of spliced video frames): each device runs the decoder
    stack on its S/n-token chunk while every layer's attention rotates KV
    chunks around the ring (``ring_attention``, config.ring_axis) — the full
    (S, S) logits never exist on any one chip, and per-chip activation memory
    is O(S/n). The reference has no long-context story at all (SURVEY §2.3).

    Returns ``(last_hidden, cache)``: the final-norm hidden of the LAST real
    token (b, 1, D) and a :class:`KVCache` of ``cache_len`` slots (default:
    padded S) with length/validity set — ready for :func:`decode_tokens`.

    Unpadded causal prompts only (positions must be row-wise arange; the
    padded tail added for divisibility is masked out of the cache and is
    causally invisible to real tokens).
    """
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from ..models.hicom import HIComModel
    from ..models.qwen2 import KVCache

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    b, S, _ = embeds.shape
    S_pad = -(-S // n) * n
    if S_pad != S:
        embeds = jnp.pad(embeds, ((0, 0), (0, S_pad - S), (0, 0)))
        tail = positions[:, -1:] + 1 + jnp.arange(S_pad - S)[None]
        positions = jnp.concatenate([positions, tail.astype(positions.dtype)], axis=1)

    tc = model.config.text_config
    twin = HIComModel(config=dataclasses.replace(
        model.config, text_config=dataclasses.replace(tc, ring_axis=axis)))
    dtype = jnp.dtype(model.config.dtype)
    S_loc = S_pad // n

    def body(params, emb, pos):
        cache = KVCache.zeros(tc.num_hidden_layers, b, tc.num_key_value_heads,
                              S_loc, tc.head_dim, dtype)

        def run(m):
            return m.language_model.model(emb, pos, cache, prefill_from_empty=True)

        hidden, c2 = twin.apply({"params": params}, method=run)
        return hidden, c2.k, c2.v

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=(P(None, axis, None),
                   P(None, None, None, axis, None),
                   P(None, None, None, axis, None)),
        check_vma=False,
    )
    hidden, k, v = jax.jit(fn)(params, embeds, positions)

    if cache_len is None:
        cache_len = S_pad
    assert cache_len >= S_pad, (cache_len, S_pad)
    pad = ((0, 0), (0, 0), (0, 0), (0, cache_len - S_pad), (0, 0))
    cache = KVCache(
        jnp.pad(k, pad), jnp.pad(v, pad),
        jnp.full((b,), S, jnp.int32),
        jnp.broadcast_to(jnp.arange(cache_len)[None, :] < S, (b, cache_len)),
        None, None,
    )
    last_hidden = hidden[:, S - 1: S]
    return last_hidden, cache


def ring_self_attention(
    q: Array,  # (b, H, L, d) — GLOBAL arrays, sequence axis to be sharded
    k: Array,
    v: Array,
    mesh,
    axis: str = "dp",
    **kwargs,
) -> Array:
    """Convenience wrapper: shard the sequence axis of global q/k/v over the
    single mesh axis ``axis`` and run ring attention (callers jit this).
    ppermute rides one ring, so exactly one axis name."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    assert isinstance(axis, str), "ring attention rotates over a single mesh axis"
    spec = P(None, None, axis)
    lens = kwargs.pop("kv_lengths", None)

    def body(q, k, v, lens):
        return ring_attention(q, k, v, axis, kv_lengths=lens, **kwargs)

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P() if lens is not None else None),
        out_specs=spec,
    )(q, k, v, lens)
