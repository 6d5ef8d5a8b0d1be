#!/usr/bin/env bash
# Round-5 item 3b (VERDICT): regenerate the LOST trained-parity curves for
# DANet / ralenet_mlp / ralenet_nra (the round-1/3 jsonls were destroyed by
# container rebuilds; PARITY.md's provenance note pointed at files that no
# longer existed). Torch side runs the reference's own model classes on CPU
# (cli/parity_train.py); the jax side + report are chained by
# scripts/r5_chip_queue.sh, which waits for the *_init.msgpack this side
# writes at the start of each run.
#
# Same pinned split as the committed round-1 curves (results/parity/split.json)
# so all six models' curves remain directly comparable.
cd /root/repo
set -u
mkdir -p runs/parity_r5
cp -n results/parity/split.json runs/parity_r5/split.json

# DANet first (fastest, conv-only) so its jax side + report complete early;
# nra last (60 epochs — its 30-epoch gate was a documented near-miss, the
# certification plateau is at 60: PARITY.md nra note).
echo "=== torch DANet (model_index 1, 30 ep) ==="
timeout 14400 python -u cli/parity_train.py --side torch --model_index 1 \
  --epochs 30 --out runs/parity_r5 > runs/r5_parity_torch_danet.log 2>&1
echo "=== torch ralenet_mlp (model_index 3, 30 ep) ==="
timeout 21600 python -u cli/parity_train.py --side torch --model_index 3 \
  --epochs 30 --out runs/parity_r5 > runs/r5_parity_torch_mlp.log 2>&1
echo "=== torch ralenet_nra (model_index 2, 60 ep) ==="
timeout 28800 python -u cli/parity_train.py --side torch --model_index 2 \
  --epochs 60 --out runs/parity_r5 > runs/r5_parity_torch_nra.log 2>&1
echo "R5_TORCH_PARITY_DONE"
