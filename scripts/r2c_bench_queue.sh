#!/usr/bin/env bash
# Round-2 measurement session: on-chip kernel tests + the full bench matrix.
# Runs after the retrain queue so the chip is free and checkpoints are fresh.
#
# HISTORICAL NOTE: these invocations predate the same-diff change of
# bench.py defaults (--fast now defaults OFF, --use-pallas ON for
# inference, batch 2048). As written today, `run --no-fast` measures the
# attention-pallas path, not plain XLA. To reproduce the published round-2
# matrix with current bench.py, the rows are:
#   plain XLA:        bench.py --no-use-pallas --no-fast [--batch N]
#   whole-stage fused: bench.py --fast [--batch N]
#   attention kernel:  bench.py [--batch N]          (the default)
#   training XLA:      bench.py --train --no-use-pallas
#   training kernel:   bench.py --train --use-pallas
cd /root/repo
mkdir -p runs
set -u

until grep -q "r2b queue done" runs/r2b_queue.log 2>/dev/null; do sleep 60; done

echo "=== TPU-gated kernel tests (Mosaic fwd+bwd on chip) ==="
ECG_TEST_TPU=1 timeout 3000 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/tpu_kernel_tests.log 2>&1
tail -n 2 runs/tpu_kernel_tests.log

echo "=== bench matrix ==="
run() { echo "--- bench $* ---"; timeout 3000 python bench.py "$@"; }
{
  run                                   # fused bf16, batch 512 (driver default)
  run --no-fast                         # XLA path, same config
  run --batch 4096                      # dispatch-amortisation probe
  run --no-fast --batch 4096
  run --use-pallas                      # attention-only kernel
  run --train                           # XLA training epoch scan
  run --train --fast-train              # fused-kernel training path
  run --train --batch 256               # larger train batch
} > runs/bench_matrix.log 2>&1
echo "r2c bench done"
