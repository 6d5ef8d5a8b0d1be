#!/usr/bin/env bash
cd /root/repo
mkdir -p runs
set -u
echo "=== test_cls with all denoisers ==="
python -u cli/test_cls.py > runs/test_cls_full.log 2>&1
echo "=== transfer learning (12-lead, frozen ralenet core) ==="
python -u cli/transfer_learning.py --noise_type_index 3 --intensity_index 0 \
  --epochs 30 --batch_size 32 > runs/transfer.log 2>&1
echo "eval queue done"
