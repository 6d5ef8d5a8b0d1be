#!/usr/bin/env bash
# Round-3m: maxfree decision evidence + packed attribution.
#   1) rerun the two kernel-tier tests whose gates were recalibrated for
#      the flash backward's uncorrelated roundings
#   2) classic-backward A/B on THIS container (flash measured 23.4k w/s;
#      the pre-flash r3h number 25.0k came from a different container)
#   3) + 4) the maxfree quality A/B: ralenet emb -4, 100 epochs, fused
#      kernels, identical seed — final SNR must match within run noise
#      for ECG_ATTN_MAXFREE to become the default
#   5) packed-forward ablation profile (attribute the 13% fwd loss)
#   6) dense-pack decision probe (kron Dense + relayout + segment LN iso)
cd /root/repo
mkdir -p runs
set -u

echo "=== 1: rerun recalibrated kernel tests ==="
ECG_TEST_TPU=1 timeout 3600 python -m pytest \
  tests/test_tpu_kernels.py::test_fused_attention_fwd_bwd_on_chip \
  tests/test_tpu_kernels.py::test_apply_packed_production_shape_on_chip \
  -q > runs/r3m_kernel_retest.log 2>&1
tail -n 2 runs/r3m_kernel_retest.log

echo "=== 2: bench train @256 classic bwd (ECG_ATTN_FLASHBWD=0) ==="
ECG_ATTN_FLASHBWD=0 timeout 7200 python bench.py --train --use-pallas \
  --batch 256 > runs/r3m_bench_train_classicbwd.log 2>&1
tail -n 1 runs/r3m_bench_train_classicbwd.log

echo "=== 3: ralenet 100ep control (use_pallas) ==="
timeout 3600 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --batch_size 32 --use_pallas \
  > runs/r3m_train_ctrl.log 2>&1
grep -E "snr|SNR" runs/r3m_train_ctrl.log | tail -2

echo "=== 4: ralenet 100ep maxfree (use_pallas, ECG_ATTN_MAXFREE=1) ==="
ECG_ATTN_MAXFREE=1 timeout 3600 python -u cli/main.py --model_index 4 \
  --noise_type_index 3 --intensity_index 0 --epochs 100 --batch_size 32 \
  --use_pallas > runs/r3m_train_maxfree.log 2>&1
grep -E "snr|SNR" runs/r3m_train_maxfree.log | tail -2

echo "=== 5: packed-forward ablation profile @2048 ==="
timeout 7200 python scripts/profile_packed.py --batch 2048 \
  > runs/r3m_profile_packed.log 2>&1
tail -n 8 runs/r3m_profile_packed.log

echo "=== 6: dense-pack decision probe ==="
timeout 7200 python scripts/probe_dense_pack.py \
  > runs/r3m_probe_dense_pack.log 2>&1
tail -n 8 runs/r3m_probe_dense_pack.log

echo "r3m queue done"
