#!/usr/bin/env bash
# Sweep body (invoked by r3_chip_queue.sh after the quick chip jobs).
cd /root/repo
set -u

# Hold for the interactive rpos-kernel debug window (touch the marker to
# release): the on-chip rpos train path failed in the rpos bench queue and
# needs exclusive chip access to diagnose before 4h of sweep runs.
until [ -f /tmp/r3_sweep_go ]; do sleep 30; done
echo "=== DWT baseline grid (4 noise x 5 intensities) -> dwt_dn_result.txt ==="
rm -f dwt_dn_result.txt
for n in 0 1 2 3; do
  for i in 0 1 2 3 4; do
    timeout 1800 python cli/dwt_dn.py --noise_type_index "$n" \
      --intensity_index "$i" >> runs/r3_dwt_grid.log 2>&1
  done
done
wc -l dwt_dn_result.txt

echo "=== training sweep: 6 models x 7 new conditions, 100 epochs ==="
# conditions: (noise_type_index intensity_index) — emb at -2/0/+2/+4 and
# bw/ma/em at -4 (intensity_index 0 = -4 ... 4 = +4; noise 0=bw 1=ma 2=em 3=emb)
for m in 5 4 3 2 1 0; do
  for spec in "3 1" "3 2" "3 3" "3 4" "0 0" "1 0" "2 0"; do
    read -r n i <<< "$spec"
    log="runs/r3_sweep_m${m}_n${n}_i${i}.log"
    [ -s "$log" ] && grep -q "snr" "$log" && { echo "skip $log"; continue; }
    echo "=== model $m noise $n intensity $i -> $log ==="
    timeout 2400 python -u cli/main.py --model_index "$m" \
      --noise_type_index "$n" --intensity_index "$i" \
      --epochs 100 --batch_size 32 > "$log" 2>&1 \
      || echo "FAILED m=$m n=$n i=$i"
  done
done
echo "r3 sweep done"
