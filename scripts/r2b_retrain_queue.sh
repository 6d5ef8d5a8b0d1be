#!/usr/bin/env bash
# Round-2 follow-up queue: rebuild the dict_data corpus WITH PVC beats and
# retrain everything the downstream-utility benchmark consumes.
#
# Root cause of the degenerate test_cls result (VERDICT round-1 item 2,
# second act): the synthetic denoiser corpus contained only sinus beats, so
# trained denoisers mangled exactly the V beats the N-vs-V classifier
# scores (measured: ralenet_nra 18.8 dB on the all-sinus corpus, ~0 dB on
# V-beat windows). Real MIT-BIH records contain ectopy; the generator now
# mirrors that (synth_ecg_record pvc_prob, default 0.15 in the builder).
#
# MUST run only after scripts/r2_tpu_queue.sh finishes: its parity-jax
# stage reads the OLD ./data/dict_data (the torch side trained on it).
cd /root/repo
mkdir -p runs
set -u

until grep -q "r2 queue done" runs/r2_queue.log 2>/dev/null; do sleep 60; done

echo "=== rebuilding dict_data with PVC beats ==="
python cli/build_data.py --out ./data/dict_data > runs/build_data_v2.log 2>&1

for m in 0 1 2 3 4 5; do
  log="runs/train2_m${m}_n3_i0.log"
  echo "=== denoiser model_index=$m -> $log ==="
  python -u cli/main.py --model_index "$m" --noise_type_index 3 \
    --intensity_index 0 --epochs 100 --batch_size 32 > "$log" 2>&1
done

echo "=== downstream-utility benchmark (take 2) ==="
python -u cli/test_cls.py > runs/test_cls2.log 2>&1
echo "r2b queue done"
