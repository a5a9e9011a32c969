"""On-device (TPU) preprocessing vs the host PIL reference path.

The device path (ops/preprocess.py) replaces the host's scalar resize loop —
the measured from-disk bottleneck (~300 ms/32-frame video on this 1-core
host, scripts/ingest_bench.py) — with two dense matmuls per frame on the
chip. These tests pin it to the PIL path (itself parity-tested against the
reference's ModifiedSiglipImageProcessor, encoder.py:31-68) within PIL's own
8.8 fixed-point quantization noise (±2 uint8 levels — same bound as the
native C++ resampler test).
"""

import numpy as np
from PIL import Image

from hicom_tpu.data.image import expand2square
from hicom_tpu.data.processor import SiglipImagePreprocessor

TOL = 2.1 / 255 / 0.5  # ±2 uint8 levels through (x/255 - .5)/.5


def _host_reference(frames_u8, size, mean=(0.5, 0.5, 0.5)):
    mean255 = tuple(int(x * 255) for x in mean)
    padded = [expand2square(Image.fromarray(f), mean255) for f in frames_u8]
    proc = SiglipImagePreprocessor(size=(size, size), use_native="never")
    return proc.preprocess(padded)["pixel_values"]


def test_device_preprocess_matches_pil_path():
    from hicom_tpu.ops.preprocess import make_device_preprocess

    rng = np.random.default_rng(0)
    for h, w in [(120, 160), (160, 120), (56, 56)]:
        frames = rng.integers(0, 256, (3, h, w, 3), dtype=np.uint8)
        fn = make_device_preprocess(h, w, 56)
        got = np.asarray(fn(frames))
        ref = _host_reference(frames, 56)
        assert got.shape == ref.shape == (3, 3, 56, 56)
        assert np.abs(got - ref).max() <= TOL, (h, w, np.abs(got - ref).max())


def test_device_preprocessor_through_process_video():
    """DeviceSiglipPreprocessor is a drop-in processor for process_video:
    same pixels as the host path, host-side expand2square skipped (the pad
    happens on device)."""
    from hicom_tpu.data.video import process_video
    from hicom_tpu.ops.preprocess import DeviceSiglipPreprocessor

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (4, 90, 144, 3), dtype=np.uint8)

    host = process_video(raw, SiglipImagePreprocessor(size=(48, 48), use_native="never"),
                         num_frames=4)
    dev = process_video(raw, DeviceSiglipPreprocessor(size=(48, 48)), num_frames=4)
    assert np.asarray(dev).shape == host.shape == (4, 3, 48, 48)
    assert np.abs(np.asarray(dev) - host).max() <= TOL


def test_process_video_raw_mode():
    """processor=None returns the decoded uint8 stack (device-preprocess
    ingest mode: the model-side program does pad+resize+normalize)."""
    from hicom_tpu.data.video import process_video

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, (5, 36, 60, 3), dtype=np.uint8)
    out = process_video(raw, None, num_frames=5)
    assert out.dtype == np.uint8 and out.shape == (5, 36, 60, 3)
    np.testing.assert_array_equal(out, raw)


def test_upscale_and_identity_sizes():
    """Upscale (in < out) and identity (in == out) geometries hit different
    filter supports; pin both."""
    from hicom_tpu.ops.preprocess import make_device_preprocess

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 40, 40, 3), dtype=np.uint8)
    for out_size in (40, 64):
        got = np.asarray(make_device_preprocess(40, 40, out_size)(frames))
        ref = _host_reference(frames, out_size)
        assert np.abs(got - ref).max() <= TOL, out_size
