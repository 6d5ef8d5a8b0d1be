#!/usr/bin/env bash
# Round-3b: measure the VPU attention engine on the real chip.
# HISTORICAL: produced runs/r3b_vpu_*.log. The VPU engine measured here
# was subsequently REMOVED (4x slower + on-chip numerics divergence; see
# docs/PROFILE_r3.md) — ECG_ATTN_ENGINE no longer exists.
# 1) iso per-stage attention with ECG_ATTN_ENGINE=auto (VPU at L<=64)
# 2) full-model forward with the engine on
# 3) sensitivity: VPU at L<=128 too
cd /root/repo
mkdir -p runs
set -u

echo "=== VPU engine: iso stages + full model (maxl=64) ==="
ECG_ATTN_ENGINE=auto timeout 5000 python scripts/profile_forward.py \
  --batch 2048 --variants full,iso \
  > runs/r3b_vpu_auto.log 2>&1
tail -n 30 runs/r3b_vpu_auto.log

echo "=== VPU engine at L<=128 ==="
ECG_ATTN_ENGINE=auto ECG_ATTN_VPU_MAXL=128 timeout 5000 \
  python scripts/profile_forward.py --batch 2048 --variants full,iso \
  > runs/r3b_vpu_maxl128.log 2>&1
tail -n 30 runs/r3b_vpu_maxl128.log

echo "r3b vpu queue done"
