#!/usr/bin/env bash
# Round-3 session F: transposed flash backward (bwdT) + maxfree attribution.
# The maxfree trained A/B (runs/r3u_*) came back NEGATIVE (control 14.96 dB,
# treatment 13.50 dB) but the treatment also ran the NEW transposed flash
# backward — confounded. This queue isolates the two and validates bwdT on
# hardware:
#   1. on-chip kernel tier (covers fwd + the new transposed bwd at
#      production shapes)
#   2. control2: 100-epoch train, maxfree=0, NEW bwdT — if it lands at
#      ~14.9 dB the backward is innocent and maxfree is the (quality)
#      culprit; if it also drops, bwdT is wrong and maxfree gets a retrial.
#   3. maxfree INFERENCE parity on control2's checkpoint (eval twice).
#   4. train bench @256 with bwdT (vs 23.4k default / 25.9k maxfree,
#      results/round3/).
cd /root/repo
set -u
for i in $(seq 1 720); do
  grep -q PACKEDPROBE_DONE runs/r3w_packedprobe.log 2>/dev/null && break
  sleep 10
done
echo "=== 1: on-chip kernel tier (transposed flash bwd) ==="
ECG_TEST_TPU=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/r3y_tpu_kernels.log 2>&1
echo "=== 2: control2 (maxfree=0, bwdT) ==="
ECG_ATTN_MAXFREE=0 timeout 7200 python -u cli/main.py --model_index 4 \
  --noise_type_index 3 --intensity_index 0 --epochs 100 --batch_size 32 \
  --use_pallas > runs/r3y_ab_control2.log 2>&1
# Gate on step 2 actually finishing (ADVICE r3: without this, find_model
# would silently pick up a STALE ralenet checkpoint at the same path) and
# pin the exact checkpoint step 2 writes.
grep -q "epoch 100/100" runs/r3y_ab_control2.log || {
  echo "control2 train did not reach epoch 100; skipping evals"; exit 1; }
CKPT=./model_save/ralenet/ralenet_99_emb_intensity-4.msgpack
echo "=== 3: maxfree inference parity on the control2 checkpoint ==="
ECG_ATTN_MAXFREE=0 timeout 3600 python -u scripts/eval_ckpt.py \
  --model_index 4 --noise_type_index 3 --intensity_index 0 --use_pallas \
  --ckpt "$CKPT" > runs/r3y_eval_m0.log 2>&1
ECG_ATTN_MAXFREE=1 timeout 3600 python -u scripts/eval_ckpt.py \
  --model_index 4 --noise_type_index 3 --intensity_index 0 --use_pallas \
  --ckpt "$CKPT" > runs/r3y_eval_m1.log 2>&1
echo "=== 4: train bench @256, bwdT ==="
timeout 7200 python -u bench.py --train --batch 256 --use-pallas \
  > runs/r3y_bench_train256.log 2>&1
echo BWDT_QUEUE_DONE
