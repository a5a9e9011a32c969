"""Eval harness tests: scorer parity with the reference + behavior checks."""

import importlib.util
import json
import sys

import numpy as np
import pytest


def load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_videomme_letter_extraction_matches_reference():
    ref = load_ref_module("/root/reference/hicom/eval/video/eval_video_mcqa_videomme.py", "ref_videomme")
    from hicom_tpu.eval.scorers import videomme_extract_letter

    cases = [
        "A", "(B)", " C.", "The best answer is D", "Answer: B", "b",
        "I think the answer to this question about the video is definitely not known",
        "The correct answer is (A).", "blah blah C blah", "",
    ]
    for s in cases:
        assert videomme_extract_letter(s) == ref.extract_characters_regex(s), s


def test_vqa_accuracy_matches_reference_m4c():
    ref = load_ref_module("/root/reference/hicom/eval/image/m4c_evaluator.py", "ref_m4c")
    from hicom_tpu.eval.scorers import EvalAIAnswerProcessor, TextVQAAccuracyEvaluator

    proc, ref_proc = EvalAIAnswerProcessor(), ref.EvalAIAnswerProcessor()
    for ans in [
        "Two Dogs.", "a CAT", "isnt it", "one hundred", "3,000", "yes!", "don't know",
        "the three dogs", "it's 5 o'clock", "none", "COULDNT say; maybe", "10.5",
    ]:
        assert proc(ans) == ref_proc(ans), ans

    rng = np.random.default_rng(0)
    words = ["cat", "dog", "two", "red", "yes", "no", "none", "a dog", "the cat"]
    preds = []
    for _ in range(25):
        preds.append({
            "pred_answer": words[rng.integers(len(words))],
            "gt_answers": [words[rng.integers(len(words))] for _ in range(10)],
        })
    ours = TextVQAAccuracyEvaluator().eval_pred_list(preds)
    theirs = ref.TextVQAAccuracyEvaluator().eval_pred_list(preds)
    assert abs(ours - theirs) < 1e-9


def test_mcqa_letter_extraction():
    from hicom_tpu.eval.common import extract_mcqa_letter

    letters = ["A", "B", "C", "D"]
    options = ["red", "blue", "green", "7"]
    assert extract_mcqa_letter("(B)", letters, options) == 1
    assert extract_mcqa_letter("The answer is D.", letters, options) == 3
    assert extract_mcqa_letter("it looks blue to me", letters, options) == 1
    assert extract_mcqa_letter("seven", letters, options, match_digit_words=True) == 3
    assert extract_mcqa_letter("no idea", letters, options) == 2  # default C
    assert extract_mcqa_letter("A", ["A", "B", "C", "D", "E"], None) == 0


def test_videomme_scoring(tmp_path):
    from hicom_tpu.eval.scorers import score_videomme

    results = [
        {
            "duration": "short", "domain": "Knowledge", "sub_category": "Law", "missing": False,
            "questions": [
                {"task_type": "Action Recognition", "answer": "A", "response": "A"},
                {"task_type": "Action Recognition", "answer": "B", "response": "C"},
            ],
        },
        {
            "duration": "long", "domain": "Life Record", "sub_category": "Travel", "missing": True,
            "questions": [{"task_type": "OCR Problems", "answer": "A", "response": "A"}],
        },
    ]
    report = score_videomme(results)
    assert report["short"]["overall"] == 50.0
    assert report["long"]["answered"] == 0  # missing skipped
    assert report["overall"] == 50.0


def test_mcqa_jsonl_scoring(tmp_path):
    from hicom_tpu.eval.scorers import score_mvbench

    path = tmp_path / "preds.jsonl"
    rows = [
        {"vid": "a", "task_type": "Action Count", "pred": 1, "gt": 1},
        {"vid": "b", "task_type": "Action Count", "pred": 0, "gt": 1},
        {"vid": "c", "task_type": "Moving Count", "pred": 2, "gt": 2},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))
    report = score_mvbench(str(path))
    assert report["overall"] == pytest.approx(100 * 2 / 3)
    assert report["by_task"]["Action Count"] == 50.0


def test_pope_scoring(tmp_path):
    from hicom_tpu.eval.scorers import score_pope

    labels = tmp_path / "labels.json"
    labels.write_text("\n".join(json.dumps({"label": l}) for l in ["yes", "no", "yes", "no"]))
    answers = [
        {"text": "Yes, there is."},
        {"text": "No."},
        {"text": "I do not think so, no"},
        {"text": "yes"},
    ]
    r = score_pope(answers, str(labels))
    assert r["TP"] == 1 and r["TN"] == 1 and r["FN"] == 1 and r["FP"] == 1
    assert r["accuracy"] == 0.5


def test_srt_parsing(tmp_path):
    from hicom_tpu.eval.benchmarks import _load_srt

    srt = tmp_path / "x.srt"
    srt.write_text(
        "1\n00:00:01,000 --> 00:00:03,500\nHello there\n\n"
        "2\n00:00:04,000 --> 00:00:06,000\n<i>Styled</i> text\\Nsecond line\n"
    )
    entries = _load_srt(str(srt))
    assert entries[0] == (1000, 3500, "Hello there")
    assert entries[1][2] == "Styled text second line"


def test_guide_instruct_rules_match_reference_spec():
    from hicom_tpu.eval.benchmarks import get_guide_instruct

    q = "What color?\nAnswer the question using a single word or phrase."
    assert get_guide_instruct(q, "gqa") == "What color?"
    q2 = "Which?\nA. cat\nB. dog"
    assert get_guide_instruct(q2, "scienceqa") == "Which?"
    q3 = "Read this\nReference OCR token: abc"
    assert get_guide_instruct(q3, "textvqa") == "Read this"


def test_run_mcqa_batching():
    from hicom_tpu.eval.benchmarks import run_mcqa

    items = [dict(idx=i, t=(2 if i < 3 else 4)) for i in range(5)]
    recorded = []
    batch_sizes = []

    def prepare(item):
        tensor = np.zeros((item["t"], 3, 4, 4))
        return tensor, f"q{item['idx']}", {"question": f"q{item['idx']}", "candidates": ["a", "b"]}, ["A", "B"], f"v{item['idx']}", 0, "task"

    def record(out, prep):
        recorded.append((prep[4], out))

    def infer_batch(tensors, instructs, guides):
        batch_sizes.append(len(tensors))
        return [f"out:{i}" for i in instructs]

    run_mcqa(items, prepare, record, None, infer_batch, batch_size=2)
    assert len(recorded) == 5
    assert recorded[0] == ("v0", "out:q0")
    # ragged flushes (shape change at item 3) PAD to batch_size — one
    # compiled shape, data-parallel divisibility — and the padding outputs
    # are discarded: 3 flushes of exactly 2 record exactly 5 results
    assert batch_sizes == [2, 2, 2]
    assert [r[0] for r in recorded] == [f"v{i}" for i in range(5)]

    # singly (no infer_batch)
    recorded.clear()
    run_mcqa(items, prepare, record, lambda t, q, modal, guide_instruct: f"s:{q}", None, 1)
    assert len(recorded) == 5 and recorded[1][1] == "s:q1"


def test_frame_sample_matches_reference():
    """frame_sample index formulas (uniform midpoint rounding + fps stride)
    match the reference bit-for-bit across durations."""
    import numpy as np

    from hicom_tpu.data.video import frame_sample
    from tests.reference_loader import load_reference

    ref = load_reference()
    ref_fs = ref.mm_utils.frame_sample

    for duration in (1, 7, 8, 9, 31, 32, 100, 723):
        for nf in (1, 4, 8, 16, 32):
            ours = frame_sample(duration, mode="uniform", num_frames=nf)
            theirs = np.asarray(ref_fs(duration, mode="uniform", num_frames=nf))
            np.testing.assert_array_equal(ours, theirs, err_msg=f"uniform d={duration} nf={nf}")
        for fps in (10, 24, 25, 30):
            ours = frame_sample(duration, mode="fps", fps=fps)
            theirs = np.asarray(ref_fs(duration, mode="fps", fps=fps))
            np.testing.assert_array_equal(ours, theirs, err_msg=f"fps d={duration} fps={fps}")
