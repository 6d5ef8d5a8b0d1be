#!/usr/bin/env bash
# Round-3k: fresh-container rerun of ALL pending chip validation (the r3
# supervisor chain from session C died with the container; compile cache is
# cold so every program recompiles, 2-26 min each).
#   1) gated on-chip kernel tier — flash backward + packed production-shape
#      tests (tests/test_tpu_kernels.py, 9 tests)
#   2) bench default fwd @2048 (holds ~82.9k w/s with the fold+flash tree?)
#   3) bench --packed fwd @2048 (the session-C A/B that never ran on chip)
#   4) bench --train --use-pallas @256 f32 (~25.0k expected)
#   5) bench --packed --train @256
# Logs to runs/r3k_*.log; sentinel line "r3k queue done" at the end.
cd /root/repo
mkdir -p runs
set -u

echo "=== waiting for TPU backend ==="
for i in $(seq 1 60); do
  if timeout 180 python - <<'EOF' > /dev/null 2>&1
import jax
assert jax.default_backend() == "tpu"
EOF
  then echo "tpu up after $i probes"; break; fi
  sleep 60
done

echo "=== 1: on-chip gated kernel tier ==="
ECG_TEST_TPU=1 timeout 7200 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/r3k_tpu_kernel_tests.log 2>&1
tail -n 3 runs/r3k_tpu_kernel_tests.log

echo "=== 2: bench default (bf16 fwd @2048) ==="
timeout 7200 python bench.py > runs/r3k_bench_default.log 2>&1
tail -n 2 runs/r3k_bench_default.log

echo "=== 3: bench --packed (bf16 fwd @2048) ==="
timeout 7200 python bench.py --packed > runs/r3k_bench_packed.log 2>&1
tail -n 2 runs/r3k_bench_packed.log

echo "=== 4: bench train @256 f32 (use-pallas, flash bwd) ==="
timeout 7200 python bench.py --train --use-pallas --batch 256 \
  > runs/r3k_bench_train256.log 2>&1
tail -n 2 runs/r3k_bench_train256.log

echo "=== 5: bench packed train @256 ==="
timeout 7200 python bench.py --packed --train --batch 256 \
  > runs/r3k_bench_packed_train256.log 2>&1
tail -n 2 runs/r3k_bench_packed_train256.log

echo "r3k queue done"
