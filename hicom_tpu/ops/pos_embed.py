"""3D additive sinusoidal position embedding for the global compressor.

Matches the reference construction (``/root/reference/hicom/model/projector.py:57-101``):
per axis, ``angle(pos, i) = pos / 10000^(2*(i//2)/d)`` with sin at even feature
indices and cos at odd ones; the final embedding is the sum of the three
broadcast (t,d)+(h,d)+(w,d) tables. Computed in float32, host-side cacheable.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def _axis_table(n: int, d_model: int) -> np.ndarray:
    pos = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(d_model, dtype=np.float64)[None, :]
    angles = pos / np.power(10000.0, (2 * (i // 2)) / np.float64(d_model))
    out = np.zeros_like(angles)
    out[:, 0::2] = np.sin(angles[:, 0::2])
    out[:, 1::2] = np.cos(angles[:, 1::2])
    return out.astype(np.float32)


def get_3d_sincos_pos_embed(t: int, h: int, w: int, d_model: int) -> np.ndarray:
    """(t, h, w, d_model) float32 additive sinusoidal embedding."""
    pt = _axis_table(t, d_model)[:, None, None, :]
    ph = _axis_table(h, d_model)[None, :, None, :]
    pw = _axis_table(w, d_model)[None, None, :, :]
    return pt + ph + pw
