"""Host ingest throughput: mp4 on disk → (t, 3, 384, 384) model-ready frames.

SURVEY §7 named host video decode the post-compression bottleneck and the
chip sustains ~197 f/s on the compute side (BENCH_r02), so ingest must keep
pace or it silently caps the end-to-end rate (VERDICT r2 next-3). This
measures the full ``process_video`` path — container demux, frame-exact
decode, uniform frame sampling, resize + normalize into the SigLIP layout —
for both the native libav reader (``native/videoreader.cpp``) and the cv2
fallback, on this host.

The reference loads the same way via decord + HF image processor inside 8
DataLoader workers (``inference_video_mcqa_videomme.py:325-326``); this host
has ONE core, so the honest comparison is frames/s/core.

Run: python scripts/ingest_bench.py [--videos N] [--frames 32] [--seconds 10]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_realistic_mp4(path: str, seconds: float = 10.0, size=(640, 360),
                        fps: float = 25.0, seed: int = 0) -> None:
    """Synthetic but codec-realistic clip: smooth moving gradients + a few
    moving blocks (pure noise would decode unrealistically slowly; static
    frames unrealistically fast)."""
    import cv2

    w, h = size
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened(), path
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phases = rng.uniform(0, 6.28, 3)
    for i in range(int(seconds * fps)):
        t = i / fps
        frame = np.stack([
            127 + 120 * np.sin(xx / 40 + 2 * t + phases[0]),
            127 + 120 * np.sin(yy / 30 - 1.5 * t + phases[1]),
            127 + 120 * np.sin((xx + yy) / 60 + t + phases[2]),
        ], axis=-1)
        # a moving high-contrast block keeps the encoder honest
        bx, by = int((t * 80) % (w - 60)), int((t * 50) % (h - 60))
        frame[by:by + 60, bx:bx + 60] = rng.integers(0, 255, (60, 60, 3))
        vw.write(frame.astype(np.uint8))
    vw.release()


def time_ingest(paths, frames: int, label: str, raw: bool = False):
    """``raw=True`` times decode-only (``processor=None`` → uint8 stack):
    the host floor that remains under device preprocessing
    (ops/preprocess.py moves pad+resize+normalize onto the chip)."""
    from hicom_tpu.data.processor import SiglipImagePreprocessor
    from hicom_tpu.data.video import process_video

    proc = None if raw else SiglipImagePreprocessor(size=(384, 384))
    # warm one video (library load, first-use setup) untimed
    process_video(paths[0], processor=proc, num_frames=frames)
    t0 = time.perf_counter()
    for p in paths:
        out = process_video(p, processor=proc, num_frames=frames)
        expect = (frames,) if raw else (frames, 3, 384, 384)
        assert out.shape[: len(expect)] == expect, out.shape
    dt = time.perf_counter() - t0
    fps = len(paths) * frames / dt
    print(f"{label}: {fps:.1f} model frames/s "
          f"({dt / len(paths) * 1e3:.0f} ms/video)", file=sys.stderr)
    return {"frames_per_sec": round(fps, 1),
            "ms_per_video": round(dt / len(paths) * 1e3, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--keep-dir", default=None, help="write/reuse mp4s here")
    args = ap.parse_args()

    d = args.keep_dir or tempfile.mkdtemp(prefix="hicom_ingest_")
    os.makedirs(d, exist_ok=True)
    paths = []
    for i in range(args.videos):
        p = os.path.join(d, f"clip{i}_{int(args.seconds)}s.mp4")
        if not os.path.exists(p):
            write_realistic_mp4(p, seconds=args.seconds, seed=i)
        paths.append(p)

    from hicom_tpu.data.native_video import native_video_available

    out = {"videos": args.videos, "frames_per_video": args.frames,
           "clip_seconds": args.seconds,
           "native_available": bool(native_video_available())}
    if native_video_available():
        os.environ.pop("HICOM_NATIVE_VIDEO", None)
        out["native"] = time_ingest(paths, args.frames, "native libav reader")
        out["native_raw"] = time_ingest(paths, args.frames,
                                        "native decode-only (device preprocess)",
                                        raw=True)
    os.environ["HICOM_NATIVE_VIDEO"] = "0"
    out["cv2_fallback"] = time_ingest(paths, args.frames, "cv2 fallback")
    out["cv2_raw"] = time_ingest(paths, args.frames,
                                 "cv2 decode-only (device preprocess)", raw=True)
    os.environ.pop("HICOM_NATIVE_VIDEO", None)

    # chip-side context: BENCH headline needs >= this to not be ingest-capped.
    # With device preprocessing (the serving default for from-disk), the host
    # cost is decode-only (the *_raw rows).
    best = max(v["frames_per_sec"] for k, v in out.items()
               if isinstance(v, dict) and "frames_per_sec" in v)
    out["keeps_pace_with_chip_at"] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
