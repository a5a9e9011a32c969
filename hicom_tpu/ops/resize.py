"""Separable linear interpolation and pooling matching torch semantics.

The local compressor builds its queries by trilinearly downsampling the feature
volume (reference: ``F.interpolate(..., mode='trilinear')`` at
``/root/reference/hicom/model/projector.py:539``) and the mean-pool video path
uses the same op (``hicom_arch.py:206``); anyres uses bilinear + max_pool2d
(``hicom_arch.py:244,254``). PyTorch's ``align_corners=False`` convention is
half-pixel-centered sampling without antialiasing, implemented here as a
separable gather+lerp per axis — exact to float rounding, and XLA-fusible.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _linear_resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """Resize one axis with half-pixel linear interpolation (no antialias)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    # torch align_corners=False: src = (dst + 0.5) * scale - 0.5, clamped to >= 0
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.maximum(src, 0.0)
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w_hi = (src - lo.astype(jnp.float32)).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w_hi = w_hi.reshape(shape)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    return x_lo + (x_hi - x_lo) * w_hi


def interpolate_linear(x: jnp.ndarray, axes: Sequence[int], out_sizes: Sequence[int]) -> jnp.ndarray:
    """N-linear interpolation over ``axes`` to ``out_sizes``.

    Matches ``torch.nn.functional.interpolate(mode='linear'/'bilinear'/'trilinear',
    align_corners=False)`` on those axes (separable product of per-axis lerps).
    """
    assert len(axes) == len(out_sizes)
    for axis, size in zip(axes, out_sizes):
        x = _linear_resize_axis(x, axis, size)
    return x


def resize_thw(x: jnp.ndarray, out_thw: Sequence[int]) -> jnp.ndarray:
    """Trilinear resize of a (t, h, w, d) volume over its first three axes."""
    assert x.ndim == 4
    return interpolate_linear(x, (0, 1, 2), tuple(out_thw))


def max_pool2d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """2D max pool with stride == window over the leading two axes of (h, w, d).

    Matches ``F.max_pool2d(kernel=2)``: trailing remainder rows/cols are dropped.
    """
    h, w, d = x.shape
    x = x[: (h // window) * window, : (w // window) * window, :]
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(window, window, 1),
        window_strides=(window, window, 1),
        padding="VALID",
    )
