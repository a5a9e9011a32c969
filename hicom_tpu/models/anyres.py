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
from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp

from ..data.image import get_anyres_image_grid_shape
from ..ops.resize import interpolate_linear, max_pool2d

Array = jnp.ndarray


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
    merge_type = getattr(config, "mm_patch_merge_type", "flat") or "flat"
    aspect = getattr(config, "image_aspect_ratio", "square") or "square"
    if not merge_type.startswith("spatial"):
        return features

    base = features[0]
    patches = features[1:]
    max_num_patches = None
    m = re.match(r"anyres_max_(\d+)", aspect) if "anyres_max" in aspect else None
    if m:
        max_num_patches = int(m.group(1))
    assert aspect == "anyres" or "anyres_max" in aspect

    try:
        nw, nh = get_anyres_image_grid_shape(
            image_size, config.image_grid_pinpoints, vision_tower_image_size
        )
    except Exception:
        nw, nh = 2, 2

    hw, d = patches.shape[1], patches.shape[-1]
    grid = patches.reshape(nh, nw, hw, hw, d)
    # stitch: (nh*hw, nw*hw, d)
    stitched = grid.transpose(0, 2, 1, 3, 4).reshape(nh * hw, nw * hw, d)

    if "maxpool2x2" in merge_type:
        merged = max_pool2d(stitched, 2)
    elif "unpad" in merge_type and max_num_patches is not None:
        hs, ws = unpad_bounds((nh * hw, nw * hw), image_size)
        merged = stitched[hs, ws]
        h, w = merged.shape[:2]
        times = math.sqrt(h * w / (max_num_patches * hw**2))
        if times > 1.1:
            merged = interpolate_linear(merged, (0, 1), (int(h // times), int(w // times)))
    elif "unpad" in merge_type:
        hs, ws = unpad_bounds((nh * hw, nw * hw), image_size)
        merged = stitched[hs, ws]
    else:
        merged = stitched

    if "nobase" in merge_type:
        return {"base": None, "patch": merged}
    return {"base": base, "patch": merged}
