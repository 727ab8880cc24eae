#!/bin/bash
# Reference launch shape (/root/reference/train.sh:1-3); gpu_list is
# accepted for CLI parity — device selection is JAX-native.
python multigpu_train.py --gpu_list=0,1 --input_size=512 \
    --batch_size_per_gpu=14 \
    --checkpoint_path=/tmp/east_resnet_v1_50_rbox/ \
    --text_scale=512 --training_data_path=/data/ocr/icdar2015/ \
    --geometry=RBOX --learning_rate=0.0001 --num_readers=16
