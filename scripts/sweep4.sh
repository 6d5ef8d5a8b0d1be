#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
set -u
# unet / DANet / ACDAE over remaining emb intensities (reference output.txt:44-58)
for m in 0 1 5; do
  for i in 1 2 3 4; do
    python -u cli/main.py --model_index "$m" --noise_type_index 3 --intensity_index "$i" \
      --epochs 100 --batch_size 32 > "runs/train_m${m}_n3_i${i}.log" 2>&1
  done
done
echo sweep4 done
