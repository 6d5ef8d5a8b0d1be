#!/usr/bin/env bash
# Round-5 chip work, serialized on the one real TPU:
#   1. f32 vs bf16 train-throughput A/B at the headline config (@256,
#      attn-pallas) — same session, back to back (VERDICT item 4).
#   2. Sweep spot-audit: re-train the emb -4 column (6 models x 100 epochs,
#      same settings as the round-3 grid: XLA path, f32, seed 2023) into a
#      committed result file (VERDICT item 3c).
#   3. bf16 quality A/B: 100-epoch ralenet emb -4 with --dtype bfloat16,
#      XLA path (isolating dtype vs the f32 sweep control) and attn-pallas
#      (certifying the full candidate default combo) (VERDICT item 4).
#   4. jax sides of the regenerated parity curves (waits for the torch
#      queue's init exports) + reports (VERDICT item 3b).
cd /root/repo
set -u
mkdir -p results/round5 runs/r5_sweep_save

echo "=== 1: train-throughput dtype A/B (attn-pallas @256) ==="
timeout 5400 python -u bench.py --train --use-pallas --batch 256 \
  --dtype float32 > runs/r5_bench_train256_f32.log 2>&1
timeout 5400 python -u bench.py --train --use-pallas --batch 256 \
  --dtype bfloat16 > runs/r5_bench_train256_bf16.log 2>&1

echo "=== 2: sweep spot-audit, emb -4 column (6 models x 100 ep) ==="
for m in 0 1 2 3 4 5; do
  echo "--- model_index $m ---"
  timeout 14400 python -u cli/main.py --model_index "$m" \
    --noise_type_index 3 --intensity_index 0 --epochs 100 \
    --output_file results/round5/sweep_emb_m4_lines.txt \
    --model_save_dir runs/r5_sweep_save \
    > "runs/r5_sweep_m${m}.log" 2>&1
done

echo "=== 3: bf16 quality A/B (100 ep ralenet emb -4) ==="
timeout 14400 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --dtype bfloat16 \
  --output_file results/round5/bf16_ab_lines.txt \
  --model_save_dir runs/r5_sweep_save \
  > runs/r5_bf16_xla.log 2>&1
timeout 14400 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --dtype bfloat16 --use_pallas \
  --output_file results/round5/bf16_ab_lines.txt \
  --model_save_dir runs/r5_sweep_save \
  > runs/r5_bf16_pallas.log 2>&1

echo "=== 4: jax parity sides (wait for torch inits) ==="
run_jax_parity () {  # $1 model_index  $2 epochs  $3 name
  local init="runs/parity_r5/$3_init.msgpack"
  for i in $(seq 1 720); do [ -f "$init" ] && break; sleep 30; done
  [ -f "$init" ] || { echo "NO_INIT $3"; return 1; }
  timeout 7200 python -u cli/parity_train.py --side jax --model_index "$1" \
    --epochs "$2" --out runs/parity_r5 > "runs/r5_parity_jax_$3.log" 2>&1
}
run_jax_parity 1 30 DANet
run_jax_parity 3 30 ralenet_mlp
run_jax_parity 2 60 ralenet_nra

echo "=== reports ==="
for m in 1 3 2; do
  python cli/parity_train.py --side report --model_index "$m" \
    --out runs/parity_r5 >> runs/r5_parity_reports.log 2>&1
done
echo "R5_CHIP_QUEUE_DONE"
