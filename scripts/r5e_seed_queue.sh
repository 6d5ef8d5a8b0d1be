#!/usr/bin/env bash
# Round-5e: multi-seed bf16-vs-f32 quality A/B at the SHIPPED config
# (kernel custom-VJP trainer; ralenet emb -4, 100 epochs). The round-5
# dtype-flip cert was single-seed (seed 2023, results/round5/
# bf16_ab_lines.txt); this adds paired runs at seeds 1 and 7 so the
# "no quality degradation" claim rests on 3 seeds. Each pair shares its
# seed (same data subsample/split both arms).
#
# Launch detached:
#   setsid nohup bash scripts/r5e_seed_queue.sh \
#     > runs/r5e_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
mkdir -p runs/r5e_save results/round5
echo "=== r5e start $(date) ==="
# serialize behind the r5d rebuild queue (one chip, one CPU core)
for i in $(seq 1 1440); do
  grep -q "r5d ALL DONE" runs/r5d_queue.log 2>/dev/null && break
  sleep 20
done
for S in 1 7; do
  for DT in float32 bfloat16; do
    echo "=== seed $S dtype $DT $(date) ==="
    timeout 14400 python -u cli/main.py --model_index 4 \
      --noise_type_index 3 --intensity_index 0 --epochs 100 \
      --seed "$S" --dtype "$DT" \
      --output_file results/round5/bf16_seed_lines.txt \
      --model_save_dir runs/r5e_save \
      > "runs/r5e_s${S}_${DT}.log" 2>&1
    echo "rc=$?"
  done
done
echo "=== summary (last-5-epoch test_snr means) ==="
python - <<'PY'
import re
for s in (1, 7):
    row = {}
    for dt in ("float32", "bfloat16"):
        snrs = [float(m.group(1)) for m in re.finditer(
            r"test_snr=([0-9.]+)", open(f"runs/r5e_s{s}_{dt}.log").read())]
        row[dt] = sum(snrs[-5:]) / 5 if len(snrs) >= 5 else None
    print(f"seed {s}: f32 last-5 mean {row['float32']}, "
          f"bf16 last-5 mean {row['bfloat16']}")
PY
echo "=== r5e ALL DONE $(date) ==="
