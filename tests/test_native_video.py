"""Native libav video reader (decord analogue) vs the cv2 fallback path.

Covers the reference loader's behaviors (mm_utils.py:574-644): frame count /
fps metadata, exact-index batch decode (sequential and seek paths), past-end
fill-forward, and process_video end-to-end equivalence between backends.
"""

import numpy as np
import pytest

from hicom_tpu.data.native_video import native_video_available

pytestmark = pytest.mark.skipif(
    not native_video_available(), reason="native video lib not built")

N_FRAMES, FPS, W, H = 50, 25, 128, 96


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    """A real mp4 whose frame index is recoverable from the pixel values
    (constant gray level 4*i survives lossy mp4v encoding within ±3)."""
    import cv2

    path = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    for i in range(N_FRAMES):
        vw.write(np.full((H, W, 3), 4 * i, dtype=np.uint8))
    vw.release()
    return path


def test_metadata(mp4):
    from hicom_tpu.data.native_video import VideoReader

    with VideoReader(mp4) as vr:
        assert len(vr) == N_FRAMES
        assert abs(vr.get_avg_fps() - FPS) < 0.5
        assert (vr.width, vr.height) == (W, H)


def test_get_batch_exact_indices(mp4):
    from hicom_tpu.data.native_video import VideoReader

    indices = [0, 3, 17, 40, 49]  # mixes decode-forward and seek paths
    with VideoReader(mp4) as vr:
        batch = vr.get_batch(indices)
    assert batch.shape == (len(indices), H, W, 3)
    for frame, idx in zip(batch, indices):
        got = float(frame.mean())
        assert abs(got - 4 * idx) < 3.0, (idx, got)


def test_get_batch_preserves_order_and_duplicates(mp4):
    from hicom_tpu.data.native_video import VideoReader

    with VideoReader(mp4) as vr:
        batch = vr.get_batch([30, 5, 30])
    assert abs(float(batch[0].mean()) - 120) < 3.0
    assert abs(float(batch[1].mean()) - 20) < 3.0
    np.testing.assert_array_equal(batch[0], batch[2])


def test_past_end_fills_forward(mp4):
    from hicom_tpu.data.native_video import VideoReader

    with VideoReader(mp4) as vr:
        batch = vr.get_batch([48, 49, 200])
    np.testing.assert_array_equal(batch[2], batch[1])


def test_matches_cv2_reader(mp4):
    from hicom_tpu.data.native_video import VideoReader
    from hicom_tpu.data.video import _read_frames_cv2

    indices = [0, 7, 23, 44]
    with VideoReader(mp4) as vr:
        native = vr.get_batch(indices)
    ref = np.stack([np.asarray(f) for f in _read_frames_cv2(mp4, indices)])
    # same codec, same libav decode; conversion rounding only
    assert np.abs(native.astype(int) - ref.astype(int)).max() <= 2


def test_process_video_backend_equivalence(mp4, monkeypatch):
    from hicom_tpu.data import video as video_mod
    from hicom_tpu.data.processor import SiglipImagePreprocessor

    proc = SiglipImagePreprocessor(size=(56, 56))
    out_native = video_mod.process_video(mp4, proc, num_frames=8)
    monkeypatch.setenv("HICOM_NATIVE_VIDEO", "0")
    out_cv2 = video_mod.process_video(mp4, proc, num_frames=8)
    assert out_native.shape == out_cv2.shape == (8, 3, 56, 56)
    assert np.abs(out_native - out_cv2).max() < 3.0 / 255 / 0.5


def test_missing_file_raises():
    from hicom_tpu.data.native_video import VideoReader

    with pytest.raises(IOError):
        VideoReader("/nonexistent/clip.mp4")
