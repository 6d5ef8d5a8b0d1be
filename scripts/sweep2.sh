#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
set -u
# ralenet across the remaining emb intensities (reference output.txt:7-10 rows)
for i in 1 2 3 4; do
  python -u cli/main.py --model_index 4 --noise_type_index 3 --intensity_index "$i" \
    --epochs 100 --batch_size 32 > "runs/train_m4_n3_i${i}.log" 2>&1
done
# DWT baseline grid (reference dwt_dn_result.txt rows)
for n in 0 1 2 3; do for i in 0 1 2 3 4; do
  python -u cli/dwt_dn.py --noise_type_index "$n" --intensity_index "$i" >> runs/dwt_sweep.log 2>&1
done; done
# driver-default bench invocation
python bench.py > runs/bench_default.log 2>&1
echo sweep2 done
