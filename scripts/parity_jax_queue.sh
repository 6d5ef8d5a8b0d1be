#!/bin/bash
# JAX side of the trained-parity experiment (same cache/split/init weights).
cd "$(dirname "$0")/.."
python cli/parity_train.py --side jax --model_index 0 --epochs 30 --out runs/parity
python cli/parity_train.py --side jax --model_index 5 --epochs 30 --out runs/parity
python cli/parity_train.py --side jax --model_index 4 --epochs 30 --out runs/parity
