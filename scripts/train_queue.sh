#!/usr/bin/env bash
# Sequential training queue on the single TPU chip (detached; logs in runs/).
cd /root/repo
mkdir -p runs
set -u
for spec in "0 3 0" "1 3 0" "2 3 0" "5 3 0"; do
  read -r m n i <<< "$spec"
  log="runs/train_m${m}_n${n}_i${i}.log"
  echo "=== model_index=$m noise=$n intensity=$i -> $log ==="
  python -u cli/main.py --model_index "$m" --noise_type_index "$n" \
    --intensity_index "$i" --epochs 100 --batch_size 32 > "$log" 2>&1
done
echo "queue done"
