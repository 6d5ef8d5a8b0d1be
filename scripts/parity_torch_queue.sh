#!/bin/bash
# Torch side of the trained-parity experiment (VERDICT round-1 item 1).
cd "$(dirname "$0")/.."
python cli/parity_train.py --side torch --model_index 0 --epochs 30 --out runs/parity
python cli/parity_train.py --side torch --model_index 5 --epochs 30 --out runs/parity
python cli/parity_train.py --side torch --model_index 4 --epochs 30 --out runs/parity
