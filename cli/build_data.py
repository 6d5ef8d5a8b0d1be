#!/usr/bin/env python
"""Build the dict_data `.npy` cache (the reference's missing build step).

Uses real PhysioNet records when present under --data_root (the reference's
expected directory names), else synthetic records. See
ecg_denoise_tpu/data/cache.py for the reconstruction rationale.

Example:
    python cli/build_data.py --out ./data/dict_data --n_synth_records 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ecg_denoise_tpu.data.cache import build_dict_data


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, default="./data/dict_data")
    p.add_argument("--data_root", type=str, default="../data",
                   help="dir containing mit-bih-*-1.0.0 subdirs (optional)")
    p.add_argument("--n_synth_records", type=int, default=8)
    p.add_argument("--seed", type=int, default=2023)
    args = p.parse_args()
    info = build_dict_data(args.out, args.data_root, args.n_synth_records, args.seed)
    print(f"built {info['n_windows']} windows in {info['out_dir']}")


if __name__ == "__main__":
    main()
