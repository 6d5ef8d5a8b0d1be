#!/usr/bin/env bash
# Round-5 chip work, part 2 — runs AFTER scripts/r5_chip_queue.sh and after
# the round-5 default flips landed (kernel trainer default, serve kernel
# default on TPU, bench --repeat medians):
#   1. on-chip kernel tier (now incl. the SHARDED kernel-path sanity test)
#   2. fresh driver-visible benches on the new defaults, --repeat medians
#   3. rpos train bench (regenerates the round-3 claim whose log was lost)
#   4. live serve on the new default path + serve_bench latency budget
# Every artifact the docs cite is copied into results/round5/ (committed).
cd /root/repo
set -u
mkdir -p results/round5

echo "=== 1: on-chip kernel tier (7 tests incl. sharded path) ==="
ECG_TEST_TPU=1 timeout 7200 python -m pytest tests/test_tpu_kernels.py -q \
  > runs/r5b_tpu_kernels.log 2>&1
tail -2 runs/r5b_tpu_kernels.log

echo "=== 2: fresh benches, new defaults, repeat-3 medians ==="
timeout 5400 python -u bench.py --repeat 3 \
  > runs/r5b_bench_fwd.log 2>&1
timeout 5400 python -u bench.py --train --batch 256 \
  > runs/r5b_bench_train256.log 2>&1
timeout 5400 python -u bench.py --train --batch 1024 \
  > runs/r5b_bench_train1024.log 2>&1

echo "=== 3: rpos train bench (RESULTS.md rpos fast-path claim) ==="
timeout 5400 python -u bench.py --train --batch 256 --r-pos detect \
  > runs/r5b_bench_rpos256.log 2>&1
timeout 5400 python -u bench.py --train --batch 256 --r-pos detect \
  --no-use-pallas > runs/r5b_bench_rpos256_xla.log 2>&1

echo "=== 4: live serve on the new default path ==="
CKPT=model_save/ralenet/ralenet_99_emb_intensity-4.msgpack
if [ -f "$CKPT" ]; then
  setsid nohup python -u cli/serve.py --model ralenet --ckpt "$CKPT" \
    --port 8793 --warmup_max 64 > runs/r5b_serve.log 2>&1 < /dev/null &
  echo $! > /tmp/r5b_serve.pid
  for i in $(seq 1 600); do
    grep -q "serving ralenet" runs/r5b_serve.log 2>/dev/null && break
    sleep 5
  done
  sleep 5
  timeout 1800 python scripts/serve_bench.py --port 8793 --batch 64 \
    --iters 30 > runs/r5b_serve_bench.log 2>&1
  kill "$(cat /tmp/r5b_serve.pid)" 2>/dev/null
else
  echo "NO_CKPT for serve" > runs/r5b_serve_bench.log
fi

echo "=== copy committed evidence ==="
for f in r5b_tpu_kernels r5b_bench_fwd r5b_bench_train256 \
         r5b_bench_train1024 r5b_bench_rpos256 r5b_bench_rpos256_xla \
         r5b_serve r5b_serve_bench r5_bench_train256_f32 \
         r5_bench_train256_bf16 r5_bf16_xla r5_bf16_pallas; do
  [ -f "runs/$f.log" ] && cp "runs/$f.log" results/round5/
done
for m in 0 1 2 3 4 5; do
  [ -f "runs/r5_sweep_m$m.log" ] && \
    tail -5 "runs/r5_sweep_m$m.log" > "results/round5/r5_sweep_m${m}_tail.log"
done
echo "R5B_CHIP_QUEUE_DONE"
