"""Visual-feature token layout post-processing (newline insertion / flattening).

Reference: ``post_process_visual_feature`` (``/root/reference/hicom/mm_utils.py:92-140``).
Given a (t, h, w, d) compressed feature volume, flatten to a token sequence and
optionally splice the learned ``image_newline`` embedding per grid row / frame /
sequence, depending on ``mm_patch_merge_type`` / ``mm_newline_position``.

All shapes are static, so each mode lowers to reshape+concat — jit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

Array = jnp.ndarray


def _flat(x: Array) -> Array:
    t, h, w, d = x.shape
    return x.reshape(t * h * w, d)


def post_process_visual_feature(
    config,
    visual_feature: Array,
    modal: str,
    image_newline: Optional[Array],
    is_anyres: bool,
) -> Array:
    merge_type = getattr(config, "mm_patch_merge_type", "flat") or "flat"
    newline_pos = getattr(config, "mm_newline_position", "one_token") or "one_token"

    if not merge_type.startswith("spatial"):
        return _flat(visual_feature)

    t, h, w, d = visual_feature.shape
    if modal == "video":
        if newline_pos == "grid":
            nl = jnp.broadcast_to(image_newline, (t, h, 1, d)).astype(visual_feature.dtype)
            x = jnp.concatenate([visual_feature, nl], axis=2)
            return x.reshape(t * h * (w + 1), d)
        if newline_pos == "frame":
            x = visual_feature.reshape(t, h * w, d)
            nl = jnp.broadcast_to(image_newline, (t, 1, d)).astype(visual_feature.dtype)
            x = jnp.concatenate([x, nl], axis=1)
            return x.reshape(t * (h * w + 1), d)
        if newline_pos == "one_token":
            x = _flat(visual_feature)
            return jnp.concatenate([x, image_newline[None].astype(x.dtype)], axis=0)
        if newline_pos == "no_token":
            return _flat(visual_feature)
        raise ValueError(f"Unexpected mm_newline_position: {newline_pos}")

    if modal == "image":
        assert t == 1, "image features must be (1, h, w, d)"
        if is_anyres:
            nl = jnp.broadcast_to(image_newline, (1, h, 1, d)).astype(visual_feature.dtype)
            x = jnp.concatenate([visual_feature, nl], axis=2)
            return x.reshape(h * (w + 1), d)
        if image_newline is not None:
            x = _flat(visual_feature)
            return jnp.concatenate([x, image_newline[None].astype(x.dtype)], axis=0)
        return _flat(visual_feature)

    return _flat(visual_feature)


def num_visual_tokens(config, thw, modal: str, is_anyres: bool = False, has_newline: bool = None) -> int:
    """Static token count produced by :func:`post_process_visual_feature`.

    Used by the static-shape splice planner (prompts reserve exactly this many
    slots) — replaces the reference's dynamic per-sample concat loop.
    """
    t, h, w = thw
    merge_type = getattr(config, "mm_patch_merge_type", "flat") or "flat"
    newline_pos = getattr(config, "mm_newline_position", "one_token") or "one_token"
    if has_newline is None:
        has_newline = "anyres" in (getattr(config, "image_aspect_ratio", "") or "")
    if not merge_type.startswith("spatial"):
        return t * h * w
    if modal == "video":
        return {
            "grid": t * h * (w + 1),
            "frame": t * (h * w + 1),
            "one_token": t * h * w + 1,
            "no_token": t * h * w,
        }[newline_pos]
    if modal == "image":
        if is_anyres:
            return h * (w + 1)
        return h * w + (1 if has_newline else 0)
    return t * h * w
