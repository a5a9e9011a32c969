"""Benchmark eval harness.

Single-command per benchmark (replaces the reference's per-GPU bash fan-out,
``scripts/eval/video/*.sh``):

    python -m hicom_tpu.eval.runner --benchmark videomme \
        --model-path CKPT --video-folder ... --question-file ... --answer-file out.json
    python -m hicom_tpu.eval.score --benchmark videomme --results out.json

Inference prompts, answer extraction and scoring reproduce the reference
(``/root/reference/hicom/eval/``) so accuracies are comparable.
"""
