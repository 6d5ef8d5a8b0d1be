#!/usr/bin/env bash
# Round-3 session F: re-measure the attention DMA floor on this container.
# The fold+maxfree profile (runs/r3v_profile_maxfree.log) shows per-stage
# attention at 1.9-2.65 ms — essentially AT the r3c compute-free floor
# (1.7-2.4 ms) — so the floor's mechanism (per-step cost vs bytes vs
# launch) now decides the next kernel move. probe_floor's G-sweep
# separates the three; its session-E numbers died with the old container.
cd /root/repo
set -u
for i in $(seq 1 1080); do
  grep -q BWDT_QUEUE_DONE runs/r3y_bwdt_queue.log 2>/dev/null && break
  sleep 10
done
echo "=== probe_floor ==="
timeout 7200 python -u scripts/probe_floor.py --batch 2048 \
  > runs/r3z_probe_floor.log 2>&1
echo FLOOR_PROBE_DONE
