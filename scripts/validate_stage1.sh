#!/usr/bin/env bash
# Stage-1 evaluation (reference protocol: 320px, predictions resized to the
# original size, threshold > 1e-9 after per-image max-normalization)
now=$(date +"%Y%m%d_%H%M%S")
mkdir -p logs

python -m tris_tpu.cli.validate \
    --size 320 \
    --dataset refcocog \
    --splitBy umd \
    --test_split val \
    --max_query_len 20 \
    --clip_weights ./weights/RN50.pt \
    --resume --pretrain stage1_refcocog_umd.pth \
    --eval \
    2>&1 | tee logs/eval_${now}_stage1_refcocog_umd.txt
