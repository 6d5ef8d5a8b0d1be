#!/usr/bin/env bash
# Grid-sweep launcher over model x noise_type x intensity — the reference's
# run.sh equivalent (reference run.sh:2-76, a commented-out scratchpad of
# `python main.py --model_index I --noise_type_index N --intensity_index K`
# lines; this version is an actual loop).
#
# Usage: scripts/run_sweep.sh [epochs] [models] [noise_types] [intensities]
#   e.g. scripts/run_sweep.sh 100 "0 1 4" "0 3" "0 2 4"
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${1:-100}"
MODELS=(${2:-0 1 2 3 4 5})
NOISES=(${3:-0 1 2 3})
INTENSITIES=(${4:-0 1 2 3 4})

for m in "${MODELS[@]}"; do
  for n in "${NOISES[@]}"; do
    for i in "${INTENSITIES[@]}"; do
      echo "=== model_index=$m noise_type_index=$n intensity_index=$i ==="
      python cli/main.py --model_index "$m" --noise_type_index "$n" \
        --intensity_index "$i" --epochs "$EPOCHS"
    done
  done
done
