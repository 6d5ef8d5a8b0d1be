#!/usr/bin/env bash
# Round-3l: the 8-sublane softmax-sum residual fixed the new-libtpu Mosaic
# abort (runs/r3l_mosaic_probe2.log: all 5 stages PASS, flash backward's
# first successful on-chip compile). Now the full backlog:
#   1) gated kernel tier (9 tests incl. packed production + packed train)
#   2) bench train @256 f32 use-pallas (flash bwd's first real number;
#      pre-flash fold baseline was 24,973 w/s)
#   3) bench packed train @256 (the session-C A/B)
#   4) maxfree A/B: default fwd + train with ECG_ATTN_MAXFREE=1
#      (vs 82,908 w/s fwd / step-2 default measured earlier today)
cd /root/repo
mkdir -p runs
set -u

echo "=== 1: on-chip gated kernel tier ==="
ECG_TEST_TPU=1 timeout 7200 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/r3l_tpu_kernel_tests.log 2>&1
tail -n 3 runs/r3l_tpu_kernel_tests.log

echo "=== 2: bench train @256 f32 (use-pallas, flash bwd) ==="
timeout 7200 python bench.py --train --use-pallas --batch 256 \
  > runs/r3l_bench_train256.log 2>&1
tail -n 2 runs/r3l_bench_train256.log

echo "=== 3: bench packed train @256 ==="
timeout 7200 python bench.py --packed --train --batch 256 \
  > runs/r3l_bench_packed_train256.log 2>&1
tail -n 2 runs/r3l_bench_packed_train256.log

echo "=== 4a: maxfree fwd A/B @2048 ==="
ECG_ATTN_MAXFREE=1 timeout 7200 python bench.py \
  > runs/r3l_bench_maxfree_fwd.log 2>&1
tail -n 2 runs/r3l_bench_maxfree_fwd.log

echo "=== 4b: maxfree train A/B @256 ==="
ECG_ATTN_MAXFREE=1 timeout 7200 python bench.py --train --use-pallas --batch 256 \
  > runs/r3l_bench_maxfree_train.log 2>&1
tail -n 2 runs/r3l_bench_maxfree_train.log

echo "r3l queue done"
