#!/usr/bin/env bash
# Stage-2 training on IRNet pseudo-masks (reference: scripts/train_stage2.sh)
now=$(date +"%Y%m%d_%H%M%S")
mkdir -p logs

python -m tris_tpu.cli.train_stage2 \
    --batch_size 48 \
    --size 320 \
    --dataset refcocog \
    --splitBy umd \
    --test_split val \
    --epoch 15 \
    --backbone clip-RN50 \
    --max_query_len 20 \
    --pseudo_path ./output/ins_seg \
    --clip_weights ./weights/RN50.pt \
    --output ./weights/stage2/refcocog_umd \
    --board_folder ./output/board \
    2>&1 | tee logs/train_${now}_stage2_refcocog_umd.txt
