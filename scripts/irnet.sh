#!/usr/bin/env bash
# IRNet pseudo-label pipeline (reference: IRNet/train_refer.sh)
python -m tris_tpu.cli.irnet \
    --train_list ./output/names/refcocog_train_names.json \
    --data_root ./data/train2014 \
    --cam_dir ./output/cam \
    --ir_label_out_dir ./output/ir_label \
    --ins_seg_out_dir ./output/ins_seg \
    --irn_weights ./output/res50_irn.msgpack \
    --irn_crop_size 512 \
    --irn_batch_size 24 \
    --irn_num_epoches 3 \
    --cam_to_ir_label_pass \
    --train_irn_pass \
    --make_ins_seg_pass
