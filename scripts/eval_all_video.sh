#!/usr/bin/env bash
# Single-command-per-benchmark video eval (replaces per-GPU bash fan-out).
set -euo pipefail
CKPT=$1; DATA=${DATA:-data}; OUT=${OUT:-eval_out}

python -m hicom_tpu.eval.runner --benchmark videomme --model-path "$CKPT" \
  --video-folder "$DATA/videomme/videos" --subtitle-folder "$DATA/videomme/subtitles" \
  --question-file "$DATA/videomme/test.parquet" --answer-file "$OUT/videomme.json"
python -m hicom_tpu.eval.score --benchmark videomme --results "$OUT/videomme.json"

python -m hicom_tpu.eval.runner --benchmark mvbench --model-path "$CKPT" \
  --video-folder "$DATA/mvbench/videos" --question-file "$DATA/mvbench/json" \
  --answer-file "$OUT/mvbench.jsonl"
python -m hicom_tpu.eval.score --benchmark mvbench --results "$OUT/mvbench.jsonl"

python -m hicom_tpu.eval.runner --benchmark mlvu --model-path "$CKPT" \
  --video-folder "$DATA/mlvu/videos" --question-file "$DATA/mlvu/json" \
  --answer-file "$OUT/mlvu.jsonl"
python -m hicom_tpu.eval.score --benchmark mlvu --results "$OUT/mlvu.jsonl"

python -m hicom_tpu.eval.runner --benchmark egoschema --model-path "$CKPT" \
  --video-folder "$DATA/egoschema/videos" --question-file "$DATA/egoschema/questions.json" \
  --answer-file "$OUT/egoschema.csv"
