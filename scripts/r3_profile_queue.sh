#!/usr/bin/env bash
# Round-3 profiling session (VERDICT r2 next-round item 1): attribute the
# per-window forward time of the 55.3k w/s headline path on the real chip.
cd /root/repo
mkdir -p runs
set -u

echo "=== ablation profile: batch 2048 bf16, attention-pallas model ==="
timeout 4000 python scripts/profile_forward.py --batch 2048 \
  --variants full,attn,leff,ln,pe,iso,iso-xla --perfetto \
  > runs/profile_fwd_2048.log 2>&1
tail -n 40 runs/profile_fwd_2048.log

echo "=== same ablations on the plain-XLA model ==="
timeout 4000 python scripts/profile_forward.py --batch 2048 --no-use-pallas \
  --variants full,attn,leff,ln,pe \
  > runs/profile_fwd_2048_xla.log 2>&1
tail -n 20 runs/profile_fwd_2048_xla.log

echo "r3 profile queue done"
