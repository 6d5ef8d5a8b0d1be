#!/usr/bin/env bash
# Round-3c: in-kernel phase ablation of the MXU attention kernel.
# Attributes the per-call cost (DMA/grid floor vs qk vs softmax vs pv)
# at every stage shape, on hardware.
cd /root/repo
mkdir -p runs
set -u

for mode in dma noqk nosm nopv; do
  echo "=== ablate: $mode ==="
  ECG_ATTN_ABLATE=$mode timeout 5000 python scripts/profile_forward.py \
    --batch 2048 --variants iso \
    > runs/r3c_ablate_$mode.log 2>&1
  tail -n 12 runs/r3c_ablate_$mode.log
done

echo "r3c ablate queue done"
