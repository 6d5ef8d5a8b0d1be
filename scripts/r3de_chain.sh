#!/usr/bin/env bash
# Chain: wait for r3c ablations, then iso-raw, then blc A/B.
cd /root/repo
while pgrep -f "r3c_ablate_queue" > /dev/null 2>&1; do sleep 30; done
bash scripts/r3d_isoraw_queue.sh > runs/r3d_isoraw_queue.log 2>&1
bash scripts/r3e_blc_queue.sh > runs/r3e_blc_queue.log 2>&1
echo "r3de chain done"
