#!/usr/bin/env bash
# 3-stage HICom training recipe on a TPU mesh
# (mirrors /root/reference/scripts/qwen2.5_7B/release/directg_local43_global32.sh).
set -euo pipefail

LLM=${LLM:-Qwen2.5-7B-Instruct}
TOWER=${TOWER:-siglip-so400m-patch14-384}
RUN=${RUN:-runs/directg_local43_global32}
DP=${DP:-4}; FSDP=${FSDP:-2}; TP=${TP:-1}

# Stage 1: projector-only pretrain (1-frame captions, lr 1e-3)
python -m hicom_tpu.train.cli \
  --model-path "$LLM" --vision-tower "$TOWER" \
  --mm-projector-type local43_global32 \
  --mm-tunable-parts mm_projector --is-pretraining \
  --data-path mixtures/pretrain.yaml --num-frames 1 \
  --learning-rate 1e-3 --per-device-train-batch-size 16 \
  --dp "$DP" --fsdp "$FSDP" --tp "$TP" \
  --output-dir "$RUN/stage1"

# Stage 2: conditional pretrain with direct guide injection (32 frames)
python -m hicom_tpu.train.cli \
  --model-path "$LLM" --vision-tower "$TOWER" \
  --mm-projector-type local43_global32 --use-guide direct \
  --pretrain-weights "$RUN/stage1/mm_projector.bin" \
  --mm-tunable-parts mm_projector \
  --data-path mixtures/conditional_pretrain.yaml --num-frames 32 \
  --learning-rate 1e-4 --guide-injector-lr 1e-3 \
  --per-device-train-batch-size 8 \
  --dp "$DP" --fsdp "$FSDP" --tp "$TP" \
  --output-dir "$RUN/stage2"

# Stage 3: SFT (unfreeze LLM + vision head + guide encoder)
python -m hicom_tpu.train.cli \
  --model-path "$LLM" --vision-tower "$TOWER" \
  --mm-projector-type local43_global32 --use-guide direct \
  --pretrain-weights "$RUN/stage2/mm_projector.bin" \
  --mm-tunable-parts mm_projector,language_model,vision_model_head,guide_encoder \
  --data-path mixtures/it_all_video.yaml --num-frames 32 \
  --learning-rate 1e-5 --vision-tower-lr 2e-6 \
  --per-device-train-batch-size 4 \
  --dp "$DP" --fsdp "$FSDP" --tp "$TP" \
  --output-dir "$RUN/stage3"
