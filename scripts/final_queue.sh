#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
set -u
python -u cli/main.py --model_index 3 --noise_type_index 3 --intensity_index 0 \
  --epochs 100 --batch_size 32 > runs/train_m3_n3_i0.log 2>&1
python -u cli/test_cls.py > runs/test_cls_final.log 2>&1
python bench.py --batch 256 > runs/bench_fast256.log 2>&1
echo final queue done
