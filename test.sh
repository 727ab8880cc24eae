#!/bin/bash
# Reference launch shape (/root/reference/test.sh:1).
python test.py --gpu_list=0 --test_data_path=./icdar_test/ \
    --checkpoint_path=./ohem_logs/ --output_dir=./tmp/
