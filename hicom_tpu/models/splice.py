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

import jax.numpy as jnp

from ..constants import IGNORE_INDEX, MODAL_INDEX_MAP

Array = jnp.ndarray

_MODAL_IDS = tuple(MODAL_INDEX_MAP.values())


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
    return SplicedInputs(embeds, out_mask, out_labels, positions)
