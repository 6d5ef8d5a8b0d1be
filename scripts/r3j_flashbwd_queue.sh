#!/usr/bin/env bash
# Round-3j: validate the flash-style backward (saved softmax sums + delta
# identity; no sum tree / divide / dp*p tree in bwd) on chip.
# 1) wait for the axon tunnel to come back (it was down during r3i)
# 2) gated kernel tier (fwd_bwd, rpos, production shapes, train step)
# 3) train bench @256 f32 A/B vs the r3h pre-flash 24,973 w/s
# 4) default fwd bench (the extra want_s path must not perturb inference)
cd /root/repo
mkdir -p runs
set -u

echo "=== waiting for TPU backend ==="
for i in $(seq 1 90); do
  if timeout 120 python - <<'EOF' > /dev/null 2>&1
import jax
assert jax.default_backend() == "tpu"
EOF
  then echo "tpu up after $i probes"; break; fi
  sleep 60
done

echo "=== on-chip gated kernel tier (flash backward) ==="
ECG_TEST_TPU=1 timeout 5400 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/tpu_kernel_tests_r3j.log 2>&1
tail -n 3 runs/tpu_kernel_tests_r3j.log

echo "=== bench: training @256 f32 (use-pallas, flash bwd) ==="
timeout 5400 python bench.py --train --use-pallas --batch 256 \
  > runs/r3j_bench_train256.log 2>&1
tail -n 2 runs/r3j_bench_train256.log

echo "=== bench: default (bf16 fwd @2048, must hold ~82.9k) ==="
timeout 5400 python bench.py > runs/r3j_bench_default.log 2>&1
tail -n 2 runs/r3j_bench_default.log

echo "r3j queue done"
