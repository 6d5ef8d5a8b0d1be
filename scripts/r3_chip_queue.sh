#!/usr/bin/env bash
# Round-3 chip queue: after the rpos benches, run the quick jax-side
# trained-parity runs (DANet/nra/mlp — VERDICT item 3) and the fast-train
# strategy A/B (item 6), THEN hand off to the long sweep
# (scripts/r3_sweep_queue.sh body).
cd /root/repo
mkdir -p runs
set -u

until grep -q "rpos bench done" runs/r3_rpos_bench.log 2>/dev/null; do sleep 60; done

echo "=== jax side of trained parity (same cache/split/init as torch) ==="
for m in 1 2; do
  timeout 3000 python cli/parity_train.py --side jax --model_index "$m" \
    --epochs 30 --out runs/parity >> runs/parity_jax_r3.log 2>&1 \
    && echo "jax m=$m done"
done
# model 3 (ralenet_mlp) needs its torch-side init export first; wait for it.
until [ -f runs/parity/ralenet_mlp_init.msgpack ]; do sleep 120; done
timeout 3000 python cli/parity_train.py --side jax --model_index 3 \
  --epochs 30 --out runs/parity >> runs/parity_jax_r3.log 2>&1 \
  && echo "jax m=3 done"

echo "=== fast-train strategy A/B (residual vs fused vs xla, batch 32) ==="
run() { echo "--- $* ---"; timeout 3000 python bench.py "$@" 2>&1 | tail -1; }
run --train --fast-train --fast-train-strategy residual
run --train --fast-train --fast-train-strategy residual --batch 256
run --train --fast-train        # round-2 fused strategy for comparison

echo "=== serving latency on chip (use_pallas, warm batch 64) ==="
setsid nohup python cli/serve.py --model ralenet \
  --ckpt model_save/ralenet/ralenet_99_emb_intensity-4.msgpack \
  --use_pallas --port 8790 --warmup_max 64 \
  > runs/serve_tpu.log 2>&1 < /dev/null &
echo $! > /tmp/serve_tpu.pid
for i in $(seq 1 360); do
  grep -q "serving ralenet" runs/serve_tpu.log && break; sleep 10
done
sleep 5
timeout 3000 python scripts/serve_bench.py --port 8790 --batch 64 --iters 30 \
  | tee runs/serve_bench_tpu.json
kill "$(cat /tmp/serve_tpu.pid)" 2>/dev/null

echo "chip queue done; starting sweep"
bash scripts/r3_sweep_queue_body.sh
