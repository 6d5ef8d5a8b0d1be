#!/usr/bin/env bash
# Round-3f: A/B the dense K-packed forward vs the div-fold default.
cd /root/repo
mkdir -p runs
set -u

echo "=== control (div-fold kernel): full + iso ==="
timeout 6000 python scripts/profile_forward.py \
  --batch 2048 --variants full,iso > runs/r3f_ctrl.log 2>&1
tail -n 12 runs/r3f_ctrl.log

echo "=== dense K-packed forward: full + iso ==="
ECG_ATTN_DENSE=1 timeout 6000 python scripts/profile_forward.py \
  --batch 2048 --variants full,iso > runs/r3f_dense.log 2>&1
tail -n 12 runs/r3f_dense.log

echo "r3f dense queue done"
