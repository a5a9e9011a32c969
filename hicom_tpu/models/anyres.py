"""Anyres image feature merging (multi-crop high-resolution images).

Behavioral port of ``process_anyres_image_feature``
(``/root/reference/hicom/model/hicom_arch.py:216-269``): crop 0 is the base
image, crops 1..n form an (nh, nw) grid at the best-fit pinpoint resolution.
Merge modes from ``mm_patch_merge_type``:

* ``maxpool2x2``  — 2×2 max-pool over the stitched grid.
* ``unpad``       — crop the letterbox padding back out (+ for ``anyres_max_N``
  a bilinear downscale when the stitched grid exceeds N patch units).
* default        — plain stitch.

TPU note: unpad/downscale sizes depend on the ORIGINAL image size, which is
host metadata — all shape arithmetic happens in Python here and the jnp ops
below are static-shape, so callers can jit per resulting shape.
"""

from __future__ import annotations

import math
import re
from typing import Dict, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp

from ..data.image import get_anyres_image_grid_shape
from ..ops.resize import interpolate_linear, max_pool2d

Array = jnp.ndarray


class AnyresPlan(NamedTuple):
    """Static merge geometry for one anyres image — hashable, so it can be a
    jit static argument: train batches group by plan and each distinct plan is
    one compiled step (the TPU answer to the reference's per-sample dynamic
    shapes in ``hicom_arch.py:216-269``)."""

    nh: int
    nw: int
    hw: int  # tower patches per side
    mode: str  # "maxpool2x2" | "unpad" | "stitch"
    unpad: Optional[Tuple[int, int, int, int]]  # (h0, h1, w0, w1) slice bounds
    down: Optional[Tuple[int, int]]  # post-unpad bilinear target (anyres_max)
    include_base: bool

    def merged_hw(self) -> Tuple[int, int]:
        H, W = self.nh * self.hw, self.nw * self.hw
        if self.mode == "maxpool2x2":
            return H // 2, W // 2
        if self.mode == "unpad":
            h0, h1, w0, w1 = self.unpad
            h, w = h1 - h0, w1 - w0
            if self.down is not None:
                return self.down
            return h, w
        return H, W

    def token_count(self, has_newline: bool) -> int:
        """Visual tokens after post-processing: base (flat + optional newline)
        + merged patch rows with a per-row newline column."""
        h, w = self.merged_hw()
        patch = h * (w + 1) if has_newline else h * w
        base = self.hw * self.hw + (1 if has_newline else 0) if self.include_base else 0
        return base + patch


def make_anyres_plan(
    image_size: Tuple[int, int],  # original (width, height)
    config,
    vision_tower_image_size: int,
    hw: Optional[int] = None,  # tower patches per side (default: from config)
) -> Optional[AnyresPlan]:
    """Host-side geometry of the anyres merge; None when the merge type is not
    spatial (plain flat features)."""
    merge_type = getattr(config, "mm_patch_merge_type", "flat") or "flat"
    aspect = getattr(config, "image_aspect_ratio", "square") or "square"
    if not merge_type.startswith("spatial"):
        return None
    m = re.match(r"anyres_max_(\d+)", aspect) if "anyres_max" in aspect else None
    max_num_patches = int(m.group(1)) if m else None
    assert aspect == "anyres" or "anyres_max" in aspect

    try:
        nw, nh = get_anyres_image_grid_shape(
            image_size, config.image_grid_pinpoints, vision_tower_image_size
        )
    except Exception:
        nw, nh = 2, 2
    if hw is None:
        patch = getattr(getattr(config, "vision_config", None), "patch_size", 14)
        hw = vision_tower_image_size // patch

    if "maxpool2x2" in merge_type:
        return AnyresPlan(nh, nw, hw, "maxpool2x2", None, None, "nobase" not in merge_type)
    if "unpad" in merge_type:
        hs, ws = unpad_bounds((nh * hw, nw * hw), image_size)
        down = None
        if max_num_patches is not None:
            h, w = hs.stop - hs.start, ws.stop - ws.start
            times = math.sqrt(h * w / (max_num_patches * hw**2))
            if times > 1.1:
                down = (int(h // times), int(w // times))
        return AnyresPlan(nh, nw, hw, "unpad", (hs.start, hs.stop, ws.start, ws.stop),
                          down, "nobase" not in merge_type)
    return AnyresPlan(nh, nw, hw, "stitch", None, None, "nobase" not in merge_type)


def apply_anyres_plan(features: Array, plan: AnyresPlan) -> Dict[str, Optional[Array]]:
    """Traced merge under a static plan: features (n, hw, hw, d) with crop 0 =
    base image → {"base": (hw, hw, d) | None, "patch": (h, w, d)}."""
    base = features[0] if plan.include_base else None
    patches = features[1:]
    hw, d = patches.shape[1], patches.shape[-1]
    grid = patches.reshape(plan.nh, plan.nw, hw, hw, d)
    stitched = grid.transpose(0, 2, 1, 3, 4).reshape(plan.nh * hw, plan.nw * hw, d)
    if plan.mode == "maxpool2x2":
        merged = max_pool2d(stitched, 2)
    elif plan.mode == "unpad":
        h0, h1, w0, w1 = plan.unpad
        merged = stitched[h0:h1, w0:w1]
        if plan.down is not None:
            merged = interpolate_linear(merged, (0, 1), plan.down)
    else:
        merged = stitched
    return {"base": base, "patch": merged}


def unpad_bounds(grid_hw: Tuple[int, int], original_size: Tuple[int, int]) -> Tuple[slice, slice]:
    """Slices that remove letterbox padding (reference mm_utils.py:347-379).

    grid_hw: stitched feature map (height, width); original_size: (width, height).
    """
    ow, oh = original_size
    ch, cw = grid_hw
    original_ar = ow / oh
    current_ar = cw / ch
    if original_ar > current_ar:
        scale = cw / ow
        new_h = int(oh * scale)
        pad = (ch - new_h) // 2
        return slice(pad, ch - pad), slice(0, cw)
    scale = ch / oh
    new_w = int(ow * scale)
    pad = (cw - new_w) // 2
    return slice(0, ch), slice(pad, cw - pad)


def process_anyres_image_feature(
    features: Array,  # (n, hw, hw, d): crop 0 = base, rest = grid patches
    image_size: Tuple[int, int],  # original (width, height)
    config,
    vision_tower_image_size: int,
) -> Union[Array, Dict[str, Optional[Array]]]:
    plan = make_anyres_plan(image_size, config, vision_tower_image_size,
                            hw=features.shape[1])
    if plan is None:
        return features
    out = apply_anyres_plan(features, plan)
    if not plan.include_base:
        out["base"] = None
    return out
