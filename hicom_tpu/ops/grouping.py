"""Spatiotemporal tile grouping for the local compressor.

Reproduces the reference's ``divide_feature`` / ``balance_divide_feature``
(``/root/reference/hicom/model/projector.py:473-522``): a (t, h, w, d) volume is
partitioned into kernel-sized tiles; axes that don't divide evenly fall back to
*overlapping* windows (later windows start one element early) so every tile has
exactly kernel_size elements.

TPU-first design: tile membership depends only on static shapes, so the window
start indices are computed in Python at trace time. The divisible case lowers to
a pure reshape/transpose (zero-cost relayout); the overlapping case to a single
gather. Both produce layout ``(num_groups, kernel_volume, d)`` with group index
flattened over (t1, h1, w1) and within-tile index over (t2, h2, w2) — identical
to the reference's einops chain.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def overlap_window_starts(n: int, kernel: int) -> np.ndarray:
    """Start index of each window along an axis of length n.

    Divisible axes get disjoint windows. Otherwise, of ``ceil(n/kernel)``
    windows the first ``n % ceil(n/kernel)`` (or all, if that is 0) advance by
    ``kernel`` and the rest advance by ``kernel - 1``, starting one element
    early — exactly the reference's balance rule.
    """
    if kernel <= 0:
        raise ValueError("kernel must be positive")
    if n % kernel == 0:
        return np.arange(0, n, kernel)
    num_windows = math.ceil(n / kernel)
    no_repeat = n % num_windows
    if no_repeat == 0:
        no_repeat = num_windows
    starts = []
    start = 0
    for i in range(num_windows):
        step = kernel if i < no_repeat else kernel - 1
        end = start + step
        starts.append(end - kernel)
        start = end
    # The reference crashes when its balance rule runs past the end (e.g.
    # n=5, kernel=4 → window [3:7) out of bounds). We clamp starts in-bounds:
    # identical wherever the reference works, well-defined everywhere else.
    return np.clip(np.asarray(starts), 0, n - kernel)


def window_indices(n: int, kernel: int) -> np.ndarray:
    """(num_windows, kernel) absolute indices along one axis."""
    starts = overlap_window_starts(n, kernel)
    return starts[:, None] + np.arange(kernel)[None, :]


def tile_thw(x: jnp.ndarray, kernel: Sequence[int]) -> jnp.ndarray:
    """Group a (t, h, w, d) volume into ((t1 h1 w1), (t2 h2 w2), d) tiles."""
    t, h, w, d = x.shape
    kt, kh, kw = kernel
    divisible = (t % kt == 0) and (h % kh == 0) and (w % kw == 0)
    if divisible:
        t1, h1, w1 = t // kt, h // kh, w // kw
        x = x.reshape(t1, kt, h1, kh, w1, kw, d)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)  # t1 h1 w1 t2 h2 w2 d
        return x.reshape(t1 * h1 * w1, kt * kh * kw, d)
    it = window_indices(t, kt)  # (t1, kt)
    ih = window_indices(h, kh)  # (h1, kh)
    iw = window_indices(w, kw)  # (w1, kw)
    t1, h1, w1 = it.shape[0], ih.shape[0], iw.shape[0]
    # advanced-indexing gather: out[a,i,b,j,c,k,:] = x[it[a,i], ih[b,j], iw[c,k], :]
    x = x[it[:, :, None, None, None, None], ih[None, None, :, :, None, None], iw[None, None, None, None, :, :], :]
    # (t1, kt, h1, kh, w1, kw, d) -> (t1, h1, w1, kt, kh, kw, d)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)
    return x.reshape(t1 * h1 * w1, kt * kh * kw, d)


def tiled_shape(thw: Sequence[int], kernel: Sequence[int]) -> Tuple[int, int, int]:
    """(t1, h1, w1) group-grid shape for a (t, h, w) volume."""
    return tuple(math.ceil(n / k) for n, k in zip(thw, kernel))
