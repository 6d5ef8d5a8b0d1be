#!/usr/bin/env bash
# Round-3e: A/B the stream-layout (blc) attention interface, full model.
cd /root/repo
mkdir -p runs
set -u

echo "=== blc interface: full model + iso (glue-free projections) ==="
ECG_ATTN_GLUE=blc timeout 6000 python scripts/profile_forward.py \
  --batch 2048 --variants full > runs/r3e_blc_full.log 2>&1
tail -n 10 runs/r3e_blc_full.log

echo "=== control: default interface, full model (same session) ==="
timeout 6000 python scripts/profile_forward.py \
  --batch 2048 --variants full > runs/r3e_ctrl_full.log 2>&1
tail -n 10 runs/r3e_ctrl_full.log

echo "r3e blc queue done"
