#!/usr/bin/env bash
# Stage-1 training on RefCOCOg-UMD (reference recipe: scripts/train_stage1.sh)
now=$(date +"%Y%m%d_%H%M%S")
mkdir -p logs

python -m tris_tpu.cli.train_stage1 \
    --batch_size 48 \
    --size 320 \
    --dataset refcocog \
    --splitBy umd \
    --test_split val \
    --epoch 15 \
    --backbone clip-RN50 \
    --max_query_len 20 \
    --negative_samples 3 \
    --clip_weights ./weights/RN50.pt \
    --critic_weights ./weights/ViT-B-32.pt \
    --output ./weights/stage1/refcocog_umd \
    --board_folder ./output/board \
    2>&1 | tee logs/train_${now}_stage1_refcocog_umd.txt
