#!/usr/bin/env bash
# Round-3d: raw-kernel iso timings (no XLA glue) + raw DMA floor.
# iso - iso-raw = glue share; iso-raw(dma) = pure per-step/DMA floor.
cd /root/repo
mkdir -p runs
set -u

echo "=== iso-raw: full kernel, no glue ==="
timeout 5000 python scripts/profile_forward.py --batch 2048 \
  --variants iso-raw > runs/r3d_isoraw.log 2>&1
tail -n 12 runs/r3d_isoraw.log

echo "=== iso-raw: dma mode (pure step+DMA floor) ==="
ECG_ATTN_ABLATE=dma timeout 5000 python scripts/profile_forward.py \
  --batch 2048 --variants iso-raw > runs/r3d_isoraw_dma.log 2>&1
tail -n 12 runs/r3d_isoraw_dma.log

echo "r3d isoraw queue done"
