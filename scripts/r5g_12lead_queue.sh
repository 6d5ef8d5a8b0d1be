#!/usr/bin/env bash
# Round-5g: rerun the 12-lead rehearsal (r4f recipe) on the FINAL tree +
# rebuilt container, consuming the r5d-trained flagship core: external
# cache -> 10-epoch frozen-core transfer -> live 12-lead serve. Chained
# behind the r5e seed A/B (one chip).
#
# Launch detached:
#   setsid nohup bash scripts/r5g_12lead_queue.sh \
#     > runs/r5g_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
echo "=== r5g start $(date) ==="
for i in $(seq 1 1080); do
  grep -q "r5e ALL DONE" runs/r5e_queue.log 2>/dev/null && break
  sleep 20
done
bash scripts/r4f_12lead_queue.sh
echo "=== r5g ALL DONE $(date) ==="
