#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
set -u
# ralenet on bw / ma / em at -4 dB (reference output.txt:2-4 rows)
for n in 0 1 2; do
  python -u cli/main.py --model_index 4 --noise_type_index "$n" --intensity_index 0 \
    --epochs 100 --batch_size 32 > "runs/train_m4_n${n}_i0.log" 2>&1
done
echo sweep3 done
