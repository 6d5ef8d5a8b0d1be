#!/usr/bin/env bash
# Round-3 session E: packed-engine attribution. Waits for the r3v queue,
# then asks: the dense glue is row-issue bound and the packed engine fixes
# exactly that — so WHERE does the packed forward lose its 13%?
#   1. packed ablation profile (attn vs attnall separates the kernel from
#      the qkv/proj matmuls + boundary transposes)
#   2. packed bench under maxfree (session-D A/B ran both sides pre-maxfree)
cd /root/repo
set -u
for i in $(seq 1 720); do
  grep -q POSTAB_DONE runs/r3v_postab.log 2>/dev/null && break
  sleep 10
done
echo "=== packed ablation profile ==="
python -u scripts/profile_packed.py > runs/r3w_profile_packed.log 2>&1
echo "=== packed bench, maxfree=1 ==="
ECG_ATTN_MAXFREE=1 python -u bench.py --packed \
  > runs/r3w_bench_packed_maxfree.log 2>&1
echo PACKEDPROBE_DONE
