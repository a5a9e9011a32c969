"""Native C++ preprocessing library vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from hicom_tpu.data.native import native_available
from hicom_tpu.data.processor import SiglipImagePreprocessor

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib not built")


def test_native_matches_pil_path():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 120, 160, 3), dtype=np.uint8)
    proc_native = SiglipImagePreprocessor(size=(56, 56), use_native="always")
    proc_pil = SiglipImagePreprocessor(size=(56, 56), use_native="never")
    out_n = proc_native.preprocess(list(frames))["pixel_values"]
    out_p = proc_pil.preprocess(list(frames))["pixel_values"]
    assert out_n.shape == out_p.shape == (4, 3, 56, 56)
    # within PIL's fixed-point quantization (±2 uint8 levels)
    assert np.abs(out_n - out_p).max() <= 2.1 / 255 / 0.5


def test_native_expand2square_matches_pil():
    from hicom_tpu.data.native import expand2square as native_pad

    from hicom_tpu.data.image import expand2square as pil_pad

    rng = np.random.default_rng(1)
    for h, w in [(100, 60), (60, 100), (50, 50)]:
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(pil_pad(Image.fromarray(arr), (11, 22, 33)))
        got = native_pad(arr, (11, 22, 33))
        np.testing.assert_array_equal(got, ref)


def test_mixed_size_inputs_fall_back():
    proc = SiglipImagePreprocessor(size=(56, 56), use_native="auto")
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (30, 40, 3), dtype=np.uint8),
            rng.integers(0, 255, (50, 20, 3), dtype=np.uint8)]
    out = proc.preprocess(imgs)["pixel_values"]
    assert out.shape == (2, 3, 56, 56)
