"""Eval harness tests: scorer parity with the reference + behavior checks."""

import importlib.util
import json
import os
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


# --------------------------------------------------------------------------- #
# GPT-judge path (offline: fake Azure client) + OQA/VCGPT/MSVC runners
# --------------------------------------------------------------------------- #


class _FakeJudgeClient:
    """Stands in for AzureOpenAI: returns canned verdicts, records prompts."""

    def __init__(self, replies):
        self.replies = list(replies)
        self.calls = []

        fake = self

        class _Completions:
            def create(self, model, messages, temperature, **kwargs):
                fake.calls.append(messages)
                content = fake.replies[len(fake.calls) - 1]

                class _Msg:
                    pass

                msg = _Msg()
                msg.content = content
                choice = _Msg()
                choice.message = msg
                out = _Msg()
                out.choices = [choice]
                return out

        class _Chat:
            completions = _Completions()

        self.chat = _Chat()


REF_JUDGE_FILES = {
    "correctness": "eval_video_oqa_vcgpt_1_correctness.py",
    "detailed_orientation": "eval_video_oqa_vcgpt_2_detailed_orientation.py",
    "context": "eval_video_oqa_vcgpt_3_context.py",
    "temporal": "eval_video_oqa_vcgpt_4_temporal.py",
    "consistency": "eval_video_oqa_vcgpt_5_consistency.py",
    "activitynet": "eval_video_oqa_activitynet.py",
    "msvc_correctness": "eval_video_cap_msvc_correctness.py",
    "msvc_detailedness": "eval_video_cap_msvc_detailedness.py",
}


@pytest.mark.parametrize("axis", sorted(REF_JUDGE_FILES))
def test_gpt_judge_rubrics_verbatim(axis):
    """The GPT-judge prompts must be the reference's text VERBATIM — scores
    are prompt-sensitive, so the prompt IS the metric definition (reference
    eval_video_oqa_vcgpt_1_correctness.py:50-76 et al.)."""
    from judge_prompt_extract import extract_messages
    from hicom_tpu.eval import gpt_judge

    ref = extract_messages(REF_JUDGE_FILES[axis])
    # Render ours with identity placeholder values so the {question}/{answer}/
    # {pred} markers survive substitution and line up with the extractor's.
    qa = {k: "{%s}" % k for k in
          ("question", "answer", "pred", "question1", "question2", "pred1", "pred2")}
    ours_sys, ours_user = gpt_judge.build_messages(axis, qa)
    assert ours_sys["content"] == ref["system"]
    assert ours_user["content"] == ref["user"]


def test_gpt_judge_caching_and_aggregation(tmp_path, monkeypatch):
    from hicom_tpu.eval import gpt_judge

    rows = [
        {"question_id": "q1", "question": "what?", "answer": "a cat", "pred": "a cat"},
        {"question_id": "q2", "question": "who?", "answer": "a dog", "pred": "a fish"},
        {"question_id": "q3", "question": "when?", "answer": "noon", "pred": "noon"},
    ]
    results = tmp_path / "preds.jsonl"
    results.write_text("\n".join(json.dumps(r) for r in rows))
    out_dir = tmp_path / "judged"

    client = _FakeJudgeClient([
        "{'pred': 'yes', 'score': 5}",
        "{'pred': 'no', 'score': 1}",
        "{'pred': 'yes', 'score': 4}",
    ])
    monkeypatch.setattr(gpt_judge, "_client", lambda: client)

    report = gpt_judge.judge_results(str(results), str(out_dir), axis="correctness")
    assert report["judged"] == 3
    assert report["accuracy"] == pytest.approx(2 / 3)
    assert report["mean_score"] == pytest.approx((5 + 1 + 4) / 3)
    assert len(client.calls) == 3
    # the reference prompt shape: rubric system message + Q/A/P user message
    sys_msg, user_msg = client.calls[0]
    assert "correctness" in sys_msg["content"] or "factual" in sys_msg["content"]
    assert "what?" in user_msg["content"] and "a cat" in user_msg["content"]

    # resume: cached per-sample files short-circuit the client (reference
    # eval_video_oqa_activitynet.py incremental-resume behavior)
    client2 = _FakeJudgeClient([])
    monkeypatch.setattr(gpt_judge, "_client", lambda: client2)
    report2 = gpt_judge.judge_results(str(results), str(out_dir), axis="correctness")
    assert report2 == report
    assert client2.calls == []


def test_gpt_judge_consistency_prompt():
    from hicom_tpu.eval import gpt_judge

    client = _FakeJudgeClient(["{'pred': 'yes', 'score': 3}"])
    qa = {"Q1": "first q", "Q2": "second q", "A": "gt", "P1": "pred one", "P2": "pred two"}
    verdict = gpt_judge._judge_one(client, "m", "consistency", qa)
    assert verdict == {"pred": "yes", "score": 3}
    user = client.calls[0][1]["content"]
    for frag in ("first q", "second q", "gt", "pred one", "pred two"):
        assert frag in user


class _Args:
    def __init__(self, **kw):
        self.num_chunks = 1
        self.chunk_idx = 0
        self.answer_gt_file = None
        self.__dict__.update(kw)


def _fake_processor():
    return {"video": lambda path, **kw: f"tensor<{path}>"}


def test_activitynet_oqa_runner(tmp_path):
    """OQA inference plumbing: v_-prefix fallback, gt join, jsonl fields
    (reference inference_video_oqa_activitynet.py:53-62)."""
    from hicom_tpu.eval.benchmarks import ActivityNetOQA

    vids = tmp_path / "videos"
    vids.mkdir()
    (vids / "v_abc.mp4").write_bytes(b"")   # found via v_ prefix
    (vids / "xyz.webm").write_bytes(b"")    # found via bare name

    qf = tmp_path / "q.json"
    qf.write_text(json.dumps([
        {"video_name": "abc", "question": "q-abc", "question_id": 1},
        {"video_name": "xyz", "question": "q-xyz", "question_id": 2},
    ]))
    gf = tmp_path / "a.json"
    gf.write_text(json.dumps([{"answer": "ans-abc"}, {"answer": "ans-xyz"}]))
    out = tmp_path / "preds.jsonl"

    calls = []

    def infer(tensor, instruct, modal=None, guide_instruct=None):
        calls.append((tensor, instruct, modal, guide_instruct))
        return f"pred:{instruct}"

    args = _Args(question_file=str(qf), answer_gt_file=str(gf),
                 video_folder=str(vids), answer_file=str(out))
    ActivityNetOQA().run(args, _fake_processor(), infer)

    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["question_id"] for r in recs] == [1, 2]
    assert recs[0]["answer"] == "ans-abc" and recs[0]["pred"] == "pred:q-abc"
    assert "v_abc.mp4" in calls[0][0] and "xyz.webm" in calls[1][0]
    assert calls[0][2] == "video" and calls[0][3] == "q-abc"  # guide = question


def test_vcgpt_consistency_runner(tmp_path):
    from hicom_tpu.eval.benchmarks import VCGPTConsistency

    vids = tmp_path / "videos"
    vids.mkdir()
    (vids / "clip.mp4").write_bytes(b"")
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps([
        {"video_name": "clip", "Q1": "ask one", "Q2": "ask two", "A": "truth"},
    ]))
    out = tmp_path / "preds.jsonl"

    args = _Args(question_file=str(qf), video_folder=str(vids), answer_file=str(out))
    VCGPTConsistency().run(args, _fake_processor(), lambda t, q, **kw: f"p:{q}")

    rec = json.loads(out.read_text().strip())
    assert rec == {"video_name": "clip", "Q1": "ask one", "Q2": "ask two",
                   "A": "truth", "P1": "p:ask one", "P2": "p:ask two"}
    # judge consumes this record directly (consistency axis field names)
    from hicom_tpu.eval import gpt_judge

    client = _FakeJudgeClient(["{'pred': 'yes', 'score': 5}"])
    assert gpt_judge._judge_one(client, "m", "consistency", rec)["score"] == 5


def test_msvc_runner(tmp_path):
    from hicom_tpu.eval.benchmarks import MSVCCaption

    vids = tmp_path / "videos"
    (vids / "sub").mkdir(parents=True)
    (vids / "sub" / "v1.mp4").write_bytes(b"")
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps([
        {"video_path": "sub/v1.mp4", "captions": ["c1", "c2"]},
    ]))
    out = tmp_path / "preds.jsonl"

    args = _Args(question_file=str(qf), video_folder=str(vids), answer_file=str(out))
    MSVCCaption().run(args, _fake_processor(), lambda t, q, **kw: "a caption")

    rec = json.loads(out.read_text().strip())
    assert rec["video_name"] == "v1"
    assert rec["answer"] == ["c1", "c2"]
    assert rec["pred"] == "a caption"
    assert rec["question"] == "Please describe the video in detail."


def test_videomme_runner_end_to_end(tmp_path):
    """Full VideoMME inference plumbing offline: parquet load, video lookup by
    youtube id, srt frame-alignment, per-question MCQA prompts, letter
    extraction, chunk-format jsonl output (reference
    inference_video_mcqa_videomme.py:100-119,185-227,250-306)."""
    import cv2
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hicom_tpu.eval.benchmarks import VideoMME
    from hicom_tpu.eval.common import merge_chunked_videomme

    # one video, two questions
    table = pa.table({
        "video_id": ["1", "1"],
        "videoID": ["ytid01", "ytid01"],
        "url": ["https://www.youtube.com/watch?v=ytid01"] * 2,
        "duration": ["short"] * 2,
        "domain": ["Knowledge"] * 2,
        "sub_category": ["Law"] * 2,
        "question_id": ["1-1", "1-2"],
        "task_type": ["Action Recognition"] * 2,
        "question": ["What color?", "How many?"],
        "options": [["A. red.", "B. blue.", "C. green.", "D. pink."],
                    ["A. one.", "B. two.", "C. three.", "D. seven."]],
        "answer": ["B", "D"],
    })
    qf = tmp_path / "test.parquet"
    pq.write_table(table, str(qf))

    # a real tiny mp4 (50 frames @ 25fps) so srt alignment has duration/fps
    vids = tmp_path / "videos"
    vids.mkdir()
    vw = cv2.VideoWriter(str(vids / "ytid01.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                         25.0, (64, 64))
    assert vw.isOpened()
    frame = np.zeros((64, 64, 3), np.uint8)
    for _ in range(50):
        vw.write(frame)
    vw.release()

    subs = tmp_path / "subs"
    subs.mkdir()
    # sampled frame times land at ~120-1840ms (8 frames over 50f@25fps)
    (subs / "ytid01.srt").write_text(
        "1\n00:00:00,000 --> 00:00:01,000\nhello subtitle\n\n"
        "2\n00:00:01,500 --> 00:00:02,000\n<i>styled</i> line\n\n"
    )

    prompts = []

    def infer(tensor, instruct, modal=None, guide_instruct=None):
        prompts.append(instruct)
        return "The best answer is (B)." if "color" in instruct else "seven"

    class Args:
        question_file = str(qf)
        video_folder = str(vids)
        subtitle_folder = str(subs)
        answer_file = str(tmp_path / "out" / "preds.json")
        num_chunks, chunk_idx = 1, 0

    processor = {"video": lambda path, **kw: np.zeros((8, 3, 8, 8), np.float32)}
    VideoMME().run(Args(), processor, infer)

    recs = merge_chunked_videomme([Args.answer_file])
    assert len(recs) == 1 and recs[0]["missing"] is False
    # letter extraction: explicit letter for q1; option-text ("seven",
    # digit-word match) for q2
    assert recs[0]["questions"][0]["response"] == "B"
    assert recs[0]["questions"][1]["response"] == "D"
    recs_sub = merge_chunked_videomme([Args.answer_file.replace(".json", "_sub.json")])
    assert recs_sub[0]["questions"][0]["response"] == "B"

    # 4 infer calls: (plain, subtitled) x 2 questions; subtitled prompts carry
    # the srt text aligned to sampled frames, with style tags stripped
    assert len(prompts) == 4
    sub_prompts = [p for p in prompts if "subtitles are listed below" in p]
    assert len(sub_prompts) == 2
    assert "hello subtitle" in sub_prompts[0]
    assert "<i>" not in sub_prompts[0] and "styled line" in sub_prompts[0]
    assert all("Respond with only the letter" in p for p in prompts)


def test_image_vqa_runner(tmp_path):
    """Image VQA single-entry runner: jsonl questions, per-benchmark guide
    strip, reference output record shape (inference_image_vqa.py:96-127)."""
    from hicom_tpu.eval.benchmarks import ImageVQA

    imgs = tmp_path / "images"
    imgs.mkdir()
    (imgs / "0001.jpg").write_bytes(b"")
    suffix = "\nAnswer the question using a single word or phrase."
    qf = tmp_path / "q.jsonl"
    qf.write_text(json.dumps({
        "question_id": 7, "image": "0001.jpg", "text": "Is there a dog?" + suffix,
    }) + "\n")

    calls = []

    def infer(tensor, instruct, modal=None, image_size=None, guide_instruct=None):
        calls.append((tensor, instruct, modal, image_size, guide_instruct))
        return "yes"

    class Args:
        question_file = str(qf)
        image_folder = str(imgs)
        answer_file = str(tmp_path / "answers.jsonl")
        sub_benchmark = "pope"
        model_id = "hicom-test"
        num_chunks, chunk_idx = 1, 0

    processor = {"image": lambda path, **kw: (f"tensor<{path}>", [(64, 48)])}
    ImageVQA().run(Args(), processor, infer)

    rec = json.loads((tmp_path / "answers.jsonl").read_text().strip())
    assert rec["question_id"] == 7 and rec["text"] == "yes"
    assert rec["prompt"].endswith(suffix)
    assert len(rec["answer_id"]) == 22 and rec["model_id"] == "hicom-test"
    # guide prompt strips the single-word suffix for pope; image modal + size
    tensor, instruct, modal, image_size, guide = calls[0]
    assert modal == "image" and image_size == (64, 48)
    assert guide == "Is there a dog?"
    assert instruct.endswith(suffix)


def test_mvbench_runner(tmp_path):
    """MVBench: 20-task json collections, per-task video roots, start/end
    bounds, letterized options (reference inference_video_mcqa_mvbench.py)."""
    from hicom_tpu.eval.benchmarks import MVBENCH_TASKS, MVBench

    qdir = tmp_path / "json"
    qdir.mkdir()
    vids = tmp_path / "videos"
    for task, (json_file, folder, data_type, has_bound) in MVBENCH_TASKS.items():
        (vids / folder).mkdir(parents=True, exist_ok=True)
        (qdir / json_file).write_text("[]")
    # one bounded task, one unbounded
    (qdir / "action_sequence.json").write_text(json.dumps([{
        "video": "c1.mp4", "question": "What first?",
        "candidates": ["jump", "sit"], "answer": "sit", "start": 1.5, "end": 9.0,
    }]))
    (qdir / "action_count.json").write_text(json.dumps([{
        "video": "c2.mp4", "question": "How many?",
        "candidates": ["one", "two", "three"], "answer": "three",
    }]))

    proc_calls = []

    def video_proc(path, s=None, e=None, **kw):
        proc_calls.append((os.path.basename(path), s, e))
        return np.zeros((4, 3, 4, 4))

    args = _Args(question_file=str(qdir), video_folder=str(vids),
                 answer_file=str(tmp_path / "preds.jsonl"))
    MVBench().run(args, {"video": video_proc}, lambda t, q, **kw: "(B)")

    recs = [json.loads(l) for l in (tmp_path / "preds.jsonl").read_text().splitlines()]
    by_task = {r["task_type"]: r for r in recs}
    assert by_task["Action Sequence"]["pred"] == 1 and by_task["Action Sequence"]["gt"] == 1
    assert by_task["Action Count"]["pred"] == 1 and by_task["Action Count"]["gt"] == 2
    bounds = {os.path.basename(p): (s, e) for p, s, e in proc_calls}
    assert bounds["c1.mp4"] == (1.5, 9.0)   # bounded task passes s/e
    assert bounds["c2.mp4"] == (None, None)


def test_mlvu_runner_deterministic_shuffle(tmp_path):
    """MLVU: 7 task types, seed-0 shuffle parity with the reference
    (inference_video_mcqa_mlvu.py:122-123)."""
    from hicom_tpu.eval.benchmarks import MLVU_TASKS, MLVU

    qdir = tmp_path / "json"
    qdir.mkdir()
    vids = tmp_path / "videos"
    n = 0
    for task, (json_file, folder, _) in MLVU_TASKS.items():
        (vids / folder).mkdir(parents=True, exist_ok=True)
        (qdir / json_file).write_text(json.dumps([{
            "video": f"v{n}.mp4", "question": f"q{n}",
            "candidates": ["a", "b"], "answer": "b",
        }]))
        n += 1

    args = _Args(question_file=str(qdir), video_folder=str(vids),
                 answer_file=str(tmp_path / "preds.jsonl"))
    MLVU().run(args, {"video": lambda p, **kw: np.zeros((4, 3, 4, 4))},
               lambda t, q, **kw: "A")
    recs = [json.loads(l) for l in (tmp_path / "preds.jsonl").read_text().splitlines()]
    assert len(recs) == len(MLVU_TASKS)
    assert all(r["pred"] == 0 and r["gt"] == 1 for r in recs)

    # the reference's exact shuffle: random.seed(0) over the same build order
    import random
    order = list(MLVU_TASKS)
    random.seed(0)
    random.shuffle(order)
    assert [r["task_type"] for r in recs] == order


def test_egoschema_runner(tmp_path):
    """EgoSchema: 5-option MCQA, q_uid CSV output for the remote validator
    (reference inference_video_mcqa_egoschema.py:55-73)."""
    from hicom_tpu.eval.benchmarks import EgoSchema

    vids = tmp_path / "videos"
    vids.mkdir()
    (vids / "uid123.mp4").write_bytes(b"")
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps([{
        "q_uid": "uid123", "question": "What happened?",
        **{f"option {i}": f"opt{i}" for i in range(5)},
    }]))

    prompts = []

    def infer(tensor, instruct, modal=None, guide_instruct=None):
        prompts.append(instruct)
        return "The best choice is (E)."

    args = _Args(question_file=str(qf), video_folder=str(vids),
                 answer_file=str(tmp_path / "out.csv"))
    EgoSchema().run(args, {"video": lambda p, **kw: np.zeros((4, 3, 4, 4))}, infer)

    assert (tmp_path / "out.csv").read_text() == "uid123, 4\n"
    assert "(E) opt4" in prompts[0] and "(A) opt0" in prompts[0]


def test_conversation_templates_match_reference():
    """Prompt strings from every shared template match the reference's
    conversation.py get_prompt() across separator styles."""
    from tests.reference_loader import load_reference

    from hicom_tpu.conversation import conv_templates

    ref = load_reference()
    import importlib

    ref_conv = importlib.import_module("hicom.conversation")

    shared = set(conv_templates) & set(ref_conv.conv_templates)
    assert len(shared) >= 8, sorted(conv_templates)
    for name in sorted(shared):
        ours = conv_templates[name].copy()
        theirs = ref_conv.conv_templates[name].copy()
        # two-turn exchange + one open turn
        ours.append_message(ours.roles[0], "hi <video> there")
        theirs.append_message(theirs.roles[0], "hi <video> there")
        ours.append_message(ours.roles[1], "hello!")
        theirs.append_message(theirs.roles[1], "hello!")
        ours.append_message(ours.roles[0], "again?")
        theirs.append_message(theirs.roles[0], "again?")
        ours.append_message(ours.roles[1], None)
        theirs.append_message(theirs.roles[1], None)
        assert ours.get_prompt() == theirs.get_prompt(), name


def test_mm_infer_prompt_ids_match_reference():
    """The exact token ids fed to generate: modal tag at head, chat template
    with generation prompt, -200/-201 splice — vs the reference's mm_infer
    preamble (hicom/__init__.py:54-86) run on the same tokenizer."""
    import copy

    from tests.reference_loader import load_reference

    from hicom_tpu.data.prompts import tokenizer_multimodal_token

    ref = load_reference()

    class Tok:
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False):
            class R: pass
            r = R(); r.input_ids = [hash(w) % 997 + 5 for w in text.split()]
            return r

        def apply_chat_template(self, messages, tokenize=False, add_generation_prompt=False):
            s = "".join(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n" for m in messages)
            return s + ("<|im_start|>assistant\n" if add_generation_prompt else "")

    tok = Tok()
    for modal_token, instruct in [("<video>", "What happens?"),
                                  ("<image>", "Describe the scene .")]:
        # both sides build: [user: tag\ninstruct] → chat template → splice
        message = [{"role": "user", "content": modal_token + "\n" + instruct}]
        prompt = tok.apply_chat_template(message, tokenize=False, add_generation_prompt=True)
        ours = np.asarray(tokenizer_multimodal_token(prompt, tok, modal_token, return_tensors="np"))
        theirs = ref.mm_utils.tokenizer_multimodal_token(prompt, tok, modal_token, return_tensors="pt").numpy()
        np.testing.assert_array_equal(ours, theirs, err_msg=modal_token)

    # multi-turn list instruct: tag prepended to the FIRST turn only
    convo = [{"role": "user", "content": "first q"},
             {"role": "assistant", "content": "ans"},
             {"role": "user", "content": "second q"}]
    message = copy.deepcopy(convo)
    message[0]["content"] = "<video>\n" + message[0]["content"]
    prompt = tok.apply_chat_template(message, tokenize=False, add_generation_prompt=True)
    ours = np.asarray(tokenizer_multimodal_token(prompt, tok, "<video>", return_tensors="np"))
    theirs = ref.mm_utils.tokenizer_multimodal_token(prompt, tok, "<video>", return_tensors="pt").numpy()
    np.testing.assert_array_equal(ours, theirs)
    assert (ours == -201).sum() == 1  # one video sentinel at the head turn


def test_prefetched_multiworker_order_and_bound():
    """_prefetched with several workers yields strictly in order and never
    holds more than workers+1 decoded items in flight (bounded memory)."""
    import threading
    import time as _time

    from hicom_tpu.eval.benchmarks import _prefetched

    in_flight = [0]
    peak = [0]
    lock = threading.Lock()

    def prepare(i):
        with lock:
            in_flight[0] += 1
            peak[0] = max(peak[0], in_flight[0])
        _time.sleep(0.002 * (i % 3))  # jitter so completion order scrambles
        with lock:
            in_flight[0] -= 1
        return i * 10

    items = list(range(24))
    out = list(_prefetched(items, prepare, workers=4))
    assert out == [i * 10 for i in items]  # submission order, not completion
    assert peak[0] <= 5  # workers+1 in-flight bound

    # empty input and the 1-worker (dev-host default) degenerate case
    assert list(_prefetched([], prepare)) == []
    assert list(_prefetched([1, 2], prepare, workers=1)) == [10, 20]
