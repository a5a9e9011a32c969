"""Static-shape multimodal embedding splice.

The reference replaces each image/video sentinel token with N visual embeddings
via a dynamic per-sample Python loop (``hicom_arch.py:271-373``) — host-bound
and shape-unstable. Here the splice is a fixed-shape gather/select:

    out[j] = text[j]            for j <  p
    out[j] = visual[j - p]      for p <= j < p + V
    out[j] = text[j - V + 1]    for j >= p + V

where ``p`` is the (traced) sentinel position and V the static visual token
count. Output length is always ``L - 1 + V``; rows without a sentinel keep
their text embeds and pad with zeros at the tail, exactly like the reference's
right-padding. Fully jit-compatible: one pass, no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX, MODAL_INDEX_MAP

Array = jnp.ndarray

_MODAL_IDS = tuple(MODAL_INDEX_MAP.values())


def constrain_batch_sharded(x: Array) -> Array:
    """Pin a (b, ...) activation to batch sharding when tracing under a mesh.

    The splice gathers (take_along_axis) otherwise let the SPMD partitioner
    pick per-op shardings; its backward scatter-add then lands on a layout
    mismatch and triggers an involuntary full rematerialization (one activation
    all-gather per train step). Constraining to the data axes removes it.
    No-op outside a mesh or when the batch doesn't divide.
    """
    # explicit-sharding world first; fall back to the classic context mesh
    # (deprecated in jax 0.8.2 — only that access is allowed to fail, so a
    # real constraint error can't silently disable this optimization)
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.axis_names:
        try:
            import warnings

            from jax.interpreters import pxla

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                mesh = pxla.thread_resources.env.physical_mesh
        except (ImportError, AttributeError):
            return x
        if mesh.empty:
            return x
    data_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.axis_names)
    if not data_axes:
        return x
    n = 1
    for a in data_axes:
        n *= mesh.shape[a]
    if x.shape[0] % n != 0:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P(data_axes))


class SplicedInputs(NamedTuple):
    embeds: Array  # (b, L-1+V, D)
    attention_mask: Array  # (b, L-1+V) bool
    labels: Optional[Array]  # (b, L-1+V) or None
    positions: Array  # (b, L-1+V) int32


def is_modal_token(input_ids: Array) -> Array:
    m = jnp.zeros(input_ids.shape, dtype=bool)
    for tok in _MODAL_IDS:
        m |= input_ids == tok
    return m


def splice_visual_embeds(
    input_ids: Array,  # (b, L); contains ≤ 1 modal sentinel per row
    text_embeds: Array,  # (b, L, D) embeddings of ids (sentinels may embed anything)
    visual_embeds: Array,  # (b, V, D)
    attention_mask: Optional[Array] = None,  # (b, L) bool
    labels: Optional[Array] = None,  # (b, L)
) -> SplicedInputs:
    b, L = input_ids.shape
    V = visual_embeds.shape[1]
    out_len = L - 1 + V

    modal = is_modal_token(input_ids)
    has_mm = jnp.any(modal, axis=1)  # (b,)
    p = jnp.argmax(modal, axis=1)  # (b,) sentinel position (0 if none)
    # rows without a sentinel: place the "splice" past the end so out[j]=text[j]
    p = jnp.where(has_mm, p, L)

    if attention_mask is None:
        attention_mask = jnp.ones((b, L), dtype=bool)
    attention_mask = attention_mask.astype(bool)  # int masks break ~out_mask

    j = jnp.arange(out_len)[None, :]  # (1, out)
    p_ = p[:, None]
    in_text_head = j < p_
    in_visual = (j >= p_) & (j < p_ + V)

    idx_text = jnp.where(in_text_head, j, j - V + 1)
    idx_text = jnp.clip(idx_text, 0, L - 1)
    idx_vis = jnp.clip(j - p_, 0, V - 1)

    gathered_text = jnp.take_along_axis(text_embeds, idx_text[..., None], axis=1)
    gathered_vis = jnp.take_along_axis(visual_embeds, idx_vis[..., None], axis=1)
    embeds = jnp.where(in_visual[..., None], gathered_vis.astype(text_embeds.dtype), gathered_text)

    text_mask = jnp.take_along_axis(attention_mask, idx_text, axis=1)
    # tail beyond the original text (no-sentinel rows) is padding
    valid_tail = jnp.where(has_mm[:, None], True, j < L)
    out_mask = jnp.where(in_visual, True, text_mask) & valid_tail
    embeds = embeds * out_mask[..., None].astype(embeds.dtype)

    out_labels = None
    if labels is not None:
        text_labels = jnp.take_along_axis(labels, idx_text, axis=1)
        out_labels = jnp.where(in_visual | ~out_mask, IGNORE_INDEX, text_labels)

    positions = jnp.broadcast_to(jnp.arange(out_len, dtype=jnp.int32)[None], (b, out_len))
    return SplicedInputs(constrain_batch_sharded(embeds), out_mask, out_labels, positions)


def splice_visual_embeds_multi(
    input_ids: Array,  # (b, L) with up to K modal sentinels per row
    text_embeds: Array,  # (b, L, D)
    visual_embeds: Array,  # (b, K, V, D) — K media per row, V tokens each
    attention_mask: Optional[Array] = None,
    labels: Optional[Array] = None,
) -> SplicedInputs:
    """K-sentinel generalization (multi-image prompts, reference
    ``hicom_arch.py:309-322`` loop). Each sentinel expands into V visual
    tokens; output length is the static ``L + K*(V-1)``. Rows with fewer than
    K sentinels ignore the surplus visual slots; the tail pads.

    Scatter formulation: input position j lands at ``j + (V-1)*#sentinels<j``;
    the k-th sentinel's V visual tokens start at its landing index.
    """
    b, L = input_ids.shape
    K, V = visual_embeds.shape[1:3]
    out_len = L + K * (V - 1)
    D = text_embeds.shape[-1]

    if attention_mask is None:
        attention_mask = jnp.ones((b, L), dtype=bool)
    attention_mask = attention_mask.astype(bool)  # int masks break label logic

    modal = is_modal_token(input_ids)
    prior = jnp.cumsum(modal.astype(jnp.int32), axis=1) - modal.astype(jnp.int32)  # sentinels before j
    # rows with MORE than K sentinels: clamp the shift (keeps every scatter
    # in-bounds — no silent OOB drops) and mask the surplus sentinels out
    out_idx = jnp.arange(L)[None] + (V - 1) * jnp.minimum(prior, K)  # (b, L)
    surplus = modal & (prior >= K)

    # text scatter (sentinel rows overwritten by visual below)
    embeds = jnp.zeros((b, out_len, D), text_embeds.dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, L))
    embeds = embeds.at[batch_idx, out_idx].set(text_embeds)

    keep = attention_mask & ~surplus
    out_mask = jnp.zeros((b, out_len), bool).at[batch_idx, out_idx].set(keep)
    out_labels = None
    if labels is not None:
        out_labels = jnp.full((b, out_len), IGNORE_INDEX, labels.dtype).at[batch_idx, out_idx].set(
            jnp.where(keep, labels, IGNORE_INDEX)
        )

    # k-th sentinel position per row: argsort trick over (not modal, j)
    order = jnp.argsort(jnp.where(modal, jnp.arange(L)[None], L + jnp.arange(L)[None]), axis=1)
    sent_pos = order[:, :K]  # (b, K) input index of k-th sentinel (garbage if absent)
    n_sent = jnp.sum(modal, axis=1)  # (b,)
    sent_out = jnp.take_along_axis(out_idx, sent_pos, axis=1)  # (b, K) landing index

    offs = jnp.arange(V)[None, None]  # (1, 1, V)
    vis_idx = sent_out[:, :, None] + offs  # (b, K, V)
    present = (jnp.arange(K)[None] < n_sent[:, None])[:, :, None]  # (b, K, 1)
    vis_idx = jnp.where(present, vis_idx, out_len)  # absent → dropped (oob index)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, K, V))
    embeds = embeds.at[bidx, vis_idx, :].set(visual_embeds.astype(embeds.dtype), mode="drop")
    out_mask = out_mask.at[bidx, vis_idx].set(True, mode="drop")
    if out_labels is not None:
        out_labels = out_labels.at[bidx, vis_idx].set(IGNORE_INDEX, mode="drop")

    embeds = embeds * out_mask[..., None].astype(embeds.dtype)
    positions = jnp.broadcast_to(jnp.arange(out_len, dtype=jnp.int32)[None], (b, out_len))
    return SplicedInputs(constrain_batch_sharded(embeds), out_mask, out_labels, positions)
