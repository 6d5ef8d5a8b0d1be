#!/usr/bin/env bash
# Round-3h: validate the pv-precision fix + VPU-engine removal on chip.
# 1) gated kernel tier (the 3 previously-red MXU tests must go green)
# 2) official bench default (bf16 fwd @2048 — must hold ~82.9k)
# 3) train bench @256 f32 (--use-pallas — measures the HIGHEST pv cost)
cd /root/repo
mkdir -p runs
set -u

echo "=== on-chip gated kernel tier (post pv-precision fix) ==="
ECG_TEST_TPU=1 timeout 5400 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/tpu_kernel_tests_r3h.log 2>&1
tail -n 5 runs/tpu_kernel_tests_r3h.log

echo "=== bench: default (bf16 fwd @2048) ==="
timeout 5400 python bench.py > runs/r3h_bench_default.log 2>&1
tail -n 3 runs/r3h_bench_default.log

echo "=== bench: training @256 f32 (use-pallas) ==="
timeout 5400 python bench.py --train --use-pallas --batch 256 \
  > runs/r3h_bench_train256.log 2>&1
tail -n 3 runs/r3h_bench_train256.log

echo "r3h queue done"
