#!/usr/bin/env bash
# DWT-baseline sweep over noise_type x intensity — the reference's dwt.sh
# equivalent (reference dwt.sh:3-12).
#
# Usage: scripts/dwt_sweep.sh [noise_types] [intensities]
set -euo pipefail
cd "$(dirname "$0")/.."

NOISES=(${1:-0 1 2 3})
INTENSITIES=(${2:-0 1 2 3 4})

for n in "${NOISES[@]}"; do
  for i in "${INTENSITIES[@]}"; do
    python cli/dwt_dn.py --noise_type_index "$n" --intensity_index "$i"
  done
done
