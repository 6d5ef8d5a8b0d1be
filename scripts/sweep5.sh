#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
set -u
# unet / DANet / ACDAE / ralenet_nra on bw, ma, em at -4 dB
for m in 0 1 5 2; do
  for n in 0 1 2; do
    python -u cli/main.py --model_index "$m" --noise_type_index "$n" --intensity_index 0 \
      --epochs 100 --batch_size 32 > "runs/train_m${m}_n${n}_i0.log" 2>&1
  done
done
echo sweep5 done
