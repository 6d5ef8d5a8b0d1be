#!/bin/bash
# Round-3 torch side of the trained-parity experiment: the three families
# round 2 left uncertified (VERDICT r2 missing item 1) — DANet (1),
# ralenet_nra (2), ralenet_mlp (3). Same cache/split/init as round 2's
# unet/ACDAE/ralenet runs (runs/parity/split.json is shared).
cd "$(dirname "$0")/.."
for m in 1 2 3; do
  python cli/parity_train.py --side torch --model_index "$m" --epochs 30 \
    --out runs/parity
done
echo "r3 parity torch queue done"
