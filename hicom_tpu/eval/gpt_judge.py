"""GPT-judged open-ended QA scoring (ActivityNet/MSVD/MSRVTT OQA, the five
Video-ChatGPT axes, MSVC captioning).

Structure mirrors the reference judges (``eval_video_oqa_activitynet.py``,
``eval_video_oqa_vcgpt_{1..5}*.py``): per-sample judgments cached as JSON files
in ``output_dir`` (incremental resume), thread-pool fan-out, then aggregate
accuracy + mean score. Requires the ``openai`` package and Azure credentials
(AZURE_OPENAI_ENDPOINT / AZURE_OPENAI_KEY); unavailable offline → clean error.

Rubrics follow the public Video-ChatGPT quantitative-evaluation protocol:
each axis judges (question, correct answer, prediction) and returns
``{'pred': 'yes'|'no', 'score': 0..5}`` (correctness/detail/context/temporal)
or just a score (consistency uses two predictions for paraphrased questions).
"""

from __future__ import annotations

import ast
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

RUBRICS = {
    "correctness": (
        "You evaluate the factual correctness of predictions for video-based question-answer pairs. "
        "Compare the predicted answer with the correct answer; synonyms and paraphrases count as matches; "
        "penalize factual errors.",
        "judge factual accuracy",
    ),
    "detailed_orientation": (
        "You evaluate the detail-orientation of predictions for video-based question-answer pairs. "
        "Check completeness (covers all major points of the correct answer) and specificity "
        "(includes specific rather than generic details).",
        "judge detail completeness and specificity",
    ),
    "context": (
        "You evaluate the contextual understanding in predictions for video-based question-answer pairs. "
        "Check whether the prediction aligns with the overall context of the video content.",
        "judge contextual alignment",
    ),
    "temporal": (
        "You evaluate the temporal understanding in predictions for video-based question-answer pairs. "
        "Check whether the prediction correctly reflects the order of events in the video.",
        "judge temporal-order accuracy",
    ),
    "consistency": (
        "You evaluate the consistency of two predictions produced for two paraphrases of the same question "
        "about a video. Check that the model gives equivalent answers when the question wording changes.",
        "judge answer consistency",
    ),
}


def _client():
    try:
        from openai import AzureOpenAI
    except ImportError as e:  # pragma: no cover - offline environment
        raise RuntimeError("GPT judging needs the `openai` package and Azure credentials") from e
    return AzureOpenAI(
        azure_endpoint=os.environ["AZURE_OPENAI_ENDPOINT"],
        api_key=os.environ["AZURE_OPENAI_KEY"],
        api_version=os.environ.get("AZURE_OPENAI_API_VERSION", "2024-02-01"),
    )


def _judge_one(client, model_name: str, axis: str, qa: Dict) -> Dict:
    system, task = RUBRICS[axis]
    if axis == "consistency":
        user = (
            f"Question 1: {qa['Q1']}\nQuestion 2: {qa['Q2']}\n"
            f"Correct Answer: {qa['A']}\nPredicted Answer 1: {qa['P1']}\nPredicted Answer 2: {qa['P2']}\n\n"
        )
    else:
        user = (
            f"Question: {qa['question']}\nCorrect Answer: {qa['answer']}\nPredicted Answer: {qa['pred']}\n\n"
        )
    user += (
        f"Please {task}. Respond ONLY with a Python dictionary string with keys 'pred' ('yes' or 'no') "
        "and 'score' (an INTEGER 0-5, 5 = best). Example: {'pred': 'yes', 'score': 4}."
    )
    completion = client.chat.completions.create(
        model=model_name,
        messages=[{"role": "system", "content": system}, {"role": "user", "content": user}],
        temperature=0,
    )
    return ast.literal_eval(completion.choices[0].message.content)


def judge_results(
    results_file: str,
    output_dir: str,
    axis: str = "correctness",
    model_name: str = "gpt-3.5-turbo",
    num_workers: int = 8,
    limit: Optional[int] = None,
) -> Dict:
    """Run (or resume) judging; returns {accuracy, mean_score, judged}."""
    os.makedirs(output_dir, exist_ok=True)
    rows: List[dict] = [json.loads(line) for line in open(results_file) if line.strip()]
    if limit:
        rows = rows[:limit]
    client = _client()

    def work(idx_row):
        idx, row = idx_row
        key = row.get("question_id") or f"row{idx}"
        cache = os.path.join(output_dir, f"{key}.json")
        if os.path.exists(cache):
            return
        verdict = _judge_one(client, model_name, axis, row)
        with open(cache, "w") as f:
            json.dump([verdict, row], f)

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        list(pool.map(work, enumerate(rows)))
    return aggregate_judgments(output_dir)


def aggregate_judgments(output_dir: str) -> Dict:
    """Aggregate cached per-sample judgments (reference combines yes-ratio
    accuracy and mean 0-5 score)."""
    yes = 0
    scores = []
    n = 0
    for fname in os.listdir(output_dir):
        if not fname.endswith(".json"):
            continue
        verdict, _ = json.load(open(os.path.join(output_dir, fname)))
        n += 1
        if str(verdict.get("pred", "")).lower() == "yes":
            yes += 1
        if "score" in verdict:
            scores.append(float(verdict["score"]))
    return {
        "judged": n,
        "accuracy": yes / n if n else 0.0,
        "mean_score": sum(scores) / len(scores) if scores else 0.0,
    }


def main(argv=None):  # pragma: no cover - needs Azure access
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--axis", default="correctness", choices=sorted(RUBRICS))
    p.add_argument("--model-name", default="gpt-3.5-turbo")
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args(argv)
    print(json.dumps(judge_results(args.results, args.output_dir, args.axis, args.model_name, args.num_workers)))


if __name__ == "__main__":
    main()
