#!/usr/bin/env bash
# Round-5k: wait for the r5j rehearsal queue, then run the full CPU
# suite on the final tree (now 164 tests — tests/test_serving.py gained
# the channel-derivation regression test mid the r5i suite run).
#
# Launch detached:
#   setsid nohup bash scripts/r5k_final_suite.sh \
#     > runs/r5k_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
echo "=== r5k start $(date) ==="
for i in $(seq 1 1080); do
  grep -q "r5j ALL DONE" runs/r5j_queue.log 2>/dev/null && break
  sleep 10
done
grep -q "r5j ALL DONE" runs/r5j_queue.log 2>/dev/null \
  || echo "WARN: r5j wait expired; running the suite anyway"
echo "=== full CPU suite $(date) ==="
timeout 7200 python -m pytest tests/ -q > runs/pytest_full_r5k.log 2>&1 \
  || echo "SUITE_FAIL"
tail -3 runs/pytest_full_r5k.log
echo "=== r5k ALL DONE $(date) ==="
