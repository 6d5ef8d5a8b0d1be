#!/usr/bin/env bash
# Round-4 perf evidence: true per-phase attention attribution + cheap
# model-level A/Bs. Chained behind the r4f 12-lead queue (one chip).
cd /root/repo
set -u
for i in $(seq 1 1080); do
  grep -q R4F_12LEAD_DONE runs/r4f_queue.log 2>/dev/null && break
  sleep 20
done
echo "=== 1: true per-stage attribution (chain=256) ==="
timeout 7200 python -u scripts/probe_true_attr.py --batch 2048 \
  > runs/r4g_true_attr.log 2>&1
echo "=== 2: batch sweep at the current default ==="
for B in 1024 4096; do
  timeout 3600 python -u bench.py --batch "$B" --iters 5 \
    > "runs/r4g_bench_b${B}.log" 2>&1
done
echo "=== 3: blc glue A/B at 2048 (post-fold re-test) ==="
ECG_ATTN_GLUE=blc timeout 3600 python -u bench.py --batch 2048 --iters 5 \
  > runs/r4g_bench_blc.log 2>&1
echo R4G_PERF_DONE
