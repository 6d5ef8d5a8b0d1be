#!/usr/bin/env bash
# Round-5i (session 2): a fresh container rebuild wiped the persistent
# compile cache, data caches, and model_save/ again. Re-warm the compile
# cache for every driver-visible path (bench fwd default config, train
# @256/@1024) and revalidate the on-chip kernel tier, then rebuild the
# base data cache so train/serve rehearsals are possible this session.
#
# Launch detached (shell tasks die at 10 min):
#   setsid nohup bash scripts/r5i_warm_queue.sh \
#     > runs/r5i_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
mkdir -p runs results/round5
echo "=== r5i start $(date) ==="

echo "=== 1: bench fwd, driver config (cold compile) $(date) ==="
timeout 5400 python bench.py --repeat 1 \
  > runs/r5i_bench_fwd_cold.log 2>&1 || echo "FWD_BENCH_FAIL"

echo "=== 2: bench train @256 (cold compile) $(date) ==="
timeout 5400 python bench.py --train --batch 256 --repeat 1 \
  > runs/r5i_bench_train256_cold.log 2>&1 || echo "TRAIN256_BENCH_FAIL"

echo "=== 3: on-chip kernel tier $(date) ==="
timeout 5400 env ECG_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/r5i_tpu_kernels.log 2>&1 || echo "TPU_TIER_FAIL"

echo "=== 4: bench train @1024 (cold compile) $(date) ==="
timeout 5400 python bench.py --train --batch 1024 --repeat 1 \
  > runs/r5i_bench_train1024_cold.log 2>&1 || echo "TRAIN1024_BENCH_FAIL"

echo "=== 5: rebuild base data cache $(date) ==="
[ -f data/dict_data/ecg.npy ] || timeout 7200 python cli/build_data.py \
  > runs/r5i_build_data.log 2>&1 || echo "BUILD_DATA_FAIL"

echo "=== 6: warm quotable bench, repeat-3 medians $(date) ==="
timeout 3600 python bench.py \
  > runs/r5i_bench_fwd_warm.log 2>&1 || echo "FWD_WARM_FAIL"
timeout 3600 python bench.py --train --batch 256 \
  > runs/r5i_bench_train256_warm.log 2>&1 || echo "TRAIN256_WARM_FAIL"

echo "=== r5i ALL DONE $(date) ==="
