#!/usr/bin/env bash
# Round-3 session E: post-A/B chip work. Waits for the maxfree trained-SNR
# A/B (scripts/r3u_maxfree_ab.sh) to finish, then:
#   1. fresh forward attribution under fold+maxfree (where does the
#      remaining 22.9 ms/batch go now?)
#   2. bench confirmations: default vs maxfree fwd @2048 and train @256
cd /root/repo
set -u
for i in $(seq 1 720); do
  grep -q MAXFREE_AB_DONE runs/r3u_maxfree_ab.log 2>/dev/null && break
  sleep 10
done
echo "=== ablation profile, maxfree=1 ==="
ECG_ATTN_MAXFREE=1 python -u scripts/profile_forward.py \
  --variants full,attn,leff,ln,pe,iso > runs/r3v_profile_maxfree.log 2>&1
echo "=== bench fwd maxfree ==="
ECG_ATTN_MAXFREE=1 python -u bench.py > runs/r3v_bench_maxfree_fwd.log 2>&1
echo "=== bench train maxfree @256 ==="
ECG_ATTN_MAXFREE=1 python -u bench.py --train --batch 256 --use-pallas \
  > runs/r3v_bench_maxfree_train.log 2>&1
echo POSTAB_DONE
