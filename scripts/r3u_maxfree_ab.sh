#!/usr/bin/env bash
# Round-3 session E: maxfree-softmax trained-SNR A/B (the gate for flipping
# ECG_ATTN_MAXFREE to default — see RESULTS.md "maxfree" section).
# Two 100-epoch ralenet(full) trainings on identical data/seed, --use_pallas:
#   control:  default kernel (per-row max subtraction)
#   treatment: ECG_ATTN_MAXFREE=1 (elementwise cap, no max lane-tree)
cd /root/repo
set -u
# wait for the data build to finish (max ~30 min)
for i in $(seq 1 180); do
  grep -q BUILD_DATA_DONE runs/r3t_build_data.log 2>/dev/null && break
  sleep 10
done
echo "=== control (maxfree=0) ==="
ECG_ATTN_MAXFREE=0 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --batch_size 32 --use_pallas \
  > runs/r3u_ab_control.log 2>&1
echo "=== treatment (maxfree=1) ==="
ECG_ATTN_MAXFREE=1 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --batch_size 32 --use_pallas \
  > runs/r3u_ab_maxfree.log 2>&1
echo MAXFREE_AB_DONE
