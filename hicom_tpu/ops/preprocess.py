"""On-device (TPU) frame preprocessing: pad-to-square + bicubic resize +
normalize as device ops.

Equivalent of the reference's host-side ``ModifiedSiglipImageProcessor``
(``/root/reference/hicom/model/encoder.py:31-68``) and of our host paths
(``data/processor.py`` PIL loop, ``native/preprocess.cpp`` C++), but running
on the chip: a separable resize is two small dense matmuls per frame
(``out = Fy @ clip8(img @ Fxᵀ)``), which is MXU work measured in microseconds
— vs ~300 ms/32-frame video for the host's scalar convolution on this 1-core
machine (scripts/ingest_bench.py). The host then only demuxes + decodes; raw
uint8 frames upload 4× smaller than fp32 pixels, and padding to square
happens on device so the pad bytes are never transferred.

Parity: the filter tables are PIL's (bicubic kernel a = -0.5, support
widened by the downscale factor = antialias), and PIL's uint8 quantization
between and after the two passes is reproduced with round+clip — agreement
with the PIL path is within PIL's own 8.8 fixed-point noise (±2 uint8
levels), same bound as the native C++ resampler (tests/test_native_preprocess.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

try:  # host-side table construction never needs jax; device fns do
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None


def pil_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix with PIL's BICUBIC
    coefficients (kernel a=-0.5; support scaled by the downscale factor =
    antialias), rows normalized to sum 1. Mirrors ``build_filter`` in
    ``native/preprocess.cpp`` which mirrors PIL's ImagingResampleHorizontal."""

    def bicubic(x: np.ndarray) -> np.ndarray:
        a = -0.5
        x = np.abs(x)
        return np.where(
            x < 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0))

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    m = np.zeros((out_size, in_size), np.float32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(max(0.0, np.floor(center - support)))
        xmax = int(min(float(in_size), np.ceil(center + support)))
        idx = np.arange(xmin, xmax)
        w = bicubic((idx - center + 0.5) / filterscale)
        total = w.sum()
        if total != 0.0:
            w = w / total
        m[xx, xmin:xmax] = w.astype(np.float32)
    return m


def _clip8(x):
    """PIL keeps a uint8 intermediate between the two resize passes and for
    the final pixels: round + clamp to [0, 255] (native/preprocess.cpp)."""
    return jnp.round(jnp.clip(x, 0.0, 255.0))


def make_device_preprocess(
    h: int,
    w: int,
    out_size: int,
    image_mean: Sequence[float] = (0.5, 0.5, 0.5),
    image_std: Sequence[float] = (0.5, 0.5, 0.5),
    rescale_factor: float = 1 / 255,
    pad_square: bool = True,
    out_dtype=None,
):
    """Build a jittable ``(t, h, w, 3) uint8 → (t, 3, out, out) float`` device
    preprocess for one input geometry. ``pad_square`` reproduces
    ``expand2square`` (reference ``mm_utils.py:143-156``): centered pad to
    max(h, w) with the mean color, done on device so pad bytes never ride the
    host→device link."""
    if pad_square and h != w:
        side = max(h, w)
        off_y, off_x = (side - h) // 2, (side - w) // 2
        in_h = in_w = side
        # int() truncation matches the host path's pad color
        # (data/video.py: tuple(int(x * 255) for x in processor.image_mean))
        bg = np.array([int(m * 255) for m in image_mean], np.float32)
    else:
        pad_square = False
        in_h, in_w = h, w
        off_y = off_x = 0
        bg = None
    fy = jnp.asarray(pil_bicubic_matrix(in_h, out_size))
    fx = jnp.asarray(pil_bicubic_matrix(in_w, out_size))
    mean = jnp.asarray(image_mean, jnp.float32)
    std = jnp.asarray(image_std, jnp.float32)

    def preprocess(frames):  # (t, h, w, 3) uint8
        x = frames.astype(jnp.float32)
        if pad_square:
            canvas = jnp.broadcast_to(
                jnp.asarray(bg), (x.shape[0], in_h, in_w, 3))
            x = canvas.at[:, off_y:off_y + h, off_x:off_x + w, :].set(x)
        # horizontal then vertical pass, uint8-quantized between like PIL
        x = _clip8(jnp.einsum("thwc,ow->thoc", x, fx))
        x = _clip8(jnp.einsum("thwc,oh->towc", x, fy))
        x = (x * rescale_factor - mean) / std
        x = x.transpose(0, 3, 1, 2)  # (t, 3, out, out)
        return x if out_dtype is None else x.astype(out_dtype)

    return preprocess


class DeviceSiglipPreprocessor:
    """Drop-in for ``data.processor.SiglipImagePreprocessor`` whose output is
    a DEVICE array: the host only decodes + stacks uint8 frames. Declares
    ``pads_to_square`` so ``process_video`` skips its host-side
    ``expand2square`` (the pad happens on device). One jit cache entry per
    input (h, w)."""

    pads_to_square = True

    def __init__(
        self,
        image_mean: Sequence[float] = (0.5, 0.5, 0.5),
        image_std: Sequence[float] = (0.5, 0.5, 0.5),
        size: Tuple[int, int] = (384, 384),
        rescale_factor: float = 1 / 255,
        out_dtype=None,
    ):
        assert size[0] == size[1], "device preprocess targets square outputs"
        self.image_mean = tuple(image_mean)
        self.image_std = tuple(image_std)
        self.size = tuple(size)
        self.rescale_factor = rescale_factor
        self.out_dtype = out_dtype
        self.crop_size = {"height": size[0], "width": size[1]}
        self._fns = {}

    def _fn(self, h: int, w: int):
        if (h, w) not in self._fns:
            self._fns[(h, w)] = jax.jit(make_device_preprocess(
                h, w, self.size[0], self.image_mean, self.image_std,
                self.rescale_factor, pad_square=True, out_dtype=self.out_dtype))
        return self._fns[(h, w)]

    def preprocess(self, images, return_tensors: str = "np") -> dict:
        frames = stack_uint8_frames(images)
        t, h, w, _ = frames.shape
        return {"pixel_values": self._fn(h, w)(frames)}

    def __call__(self, images, return_tensors="np"):
        return self.preprocess(images, return_tensors)


def stack_uint8_frames(images) -> np.ndarray:
    """PIL images / uint8 arrays (uniform size) → (t, h, w, 3) uint8 stack."""
    from PIL import Image

    arrs = []
    for img in images if isinstance(images, (list, tuple)) else [images]:
        if isinstance(img, Image.Image):
            if img.mode != "RGB":
                img = img.convert("RGB")
            arrs.append(np.asarray(img))
        else:
            a = np.asarray(img)
            assert a.dtype == np.uint8 and a.ndim == 3 and a.shape[-1] == 3, (
                a.dtype, a.shape)
            arrs.append(a)
    assert len({a.shape for a in arrs}) == 1, "uniform frame sizes required"
    return np.stack(arrs)
