#!/usr/bin/env bash
# PRMS response-map selection + CAM dump over the train split (feeds IRNet)
python -m tris_tpu.cli.validate \
    --size 320 \
    --dataset refcocog \
    --splitBy umd \
    --test_split train \
    --max_query_len 20 \
    --clip_weights ./weights/RN50.pt \
    --critic_weights ./weights/ViT-B-32.pt \
    --resume --pretrain ./weights/stage1/refcocog_umd/best.msgpack \
    --eval --prms --save_cam \
    --cam_save_dir ./output/cam \
    --name_save_dir ./output/names
