#!/usr/bin/env bash
# Round-2 master TPU queue (single chip — strictly sequential).
#
# 1. Train all six denoisers on emb -4 (downstream-utility retrain,
#    VERDICT round-1 item 2) — the aligned cls cache needs fresh
#    checkpoints trained on the matching dict_data distribution.
# 2. Train the beat classifier, then run the 10-condition benchmark.
# 3. JAX side of the trained-parity experiment (VERDICT item 1); the
#    torch side runs concurrently on CPU and writes the shared init
#    weights at the start of each of its runs.
cd /root/repo
mkdir -p runs
set -u

for m in 0 1 2 3 4 5; do
  log="runs/train_m${m}_n3_i0.log"
  echo "=== denoiser model_index=$m -> $log ==="
  python -u cli/main.py --model_index "$m" --noise_type_index 3 \
    --intensity_index 0 --epochs 100 --batch_size 32 > "$log" 2>&1
done

echo "=== classifier ==="
python -u cli/train_cls.py --epochs 50 > runs/train_cls.log 2>&1

echo "=== downstream-utility benchmark ==="
python -u cli/test_cls.py > runs/test_cls.log 2>&1

echo "=== parity: jax side ==="
for m in 0 5 4; do
  init="runs/parity/$(python - "$m" <<'EOF'
import sys
print(["unet","DANet","ralenet_nra","ralenet_mlp","ralenet","ACDAE"][int(sys.argv[1])])
EOF
)_init.msgpack"
  for i in $(seq 360); do  # wait up to 6h for the torch side's init export
    [ -f "$init" ] && break
    sleep 60
  done
  python -u cli/parity_train.py --side jax --model_index "$m" --epochs 30 \
    --out runs/parity > "runs/parity_jax_m${m}.log" 2>&1
done
echo "r2 queue done"
