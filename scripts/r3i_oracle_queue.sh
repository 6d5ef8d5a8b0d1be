#!/usr/bin/env bash
# Round-3i: validate the precision-mirrored test oracle on chip.
# Only tests changed (kernel untouched since 610088d), so no re-bench:
# the gated kernel tier must go 7/7 green.
cd /root/repo
mkdir -p runs
set -u

echo "=== on-chip gated kernel tier (precision-mirrored oracle) ==="
ECG_TEST_TPU=1 timeout 5400 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/tpu_kernel_tests_r3i.log 2>&1
tail -n 5 runs/tpu_kernel_tests_r3i.log

echo "r3i queue done"
