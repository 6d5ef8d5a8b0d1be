#!/usr/bin/env bash
# Round-3g: validate the changed kernels on chip, then official numbers.
cd /root/repo
mkdir -p runs
set -u

echo "=== on-chip gated kernel tier ==="
ECG_TEST_TPU=1 timeout 5400 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/tpu_kernel_tests_r3b.log 2>&1
tail -n 5 runs/tpu_kernel_tests_r3b.log

echo "=== official bench: default (attention kernel, batch 2048) ==="
timeout 5400 python bench.py > runs/r3g_bench_default.log 2>&1
tail -n 3 runs/r3g_bench_default.log

echo "=== bench: training @256 (use-pallas) ==="
timeout 5400 python bench.py --train --use-pallas --batch 256 \
  > runs/r3g_bench_train256.log 2>&1
tail -n 3 runs/r3g_bench_train256.log

echo "r3g bench queue done"
