#!/usr/bin/env bash
# Round-5l: warm the compile cache for the driver's single-chip
# compile check (__graft_entry__.entry(): batch-8 f32 forward) — the
# r5i queue warmed only the bench configs, and a cold compile through
# the tunnel can take 2-26 min. Waits for the r5j rehearsal queue so
# chip work stays sequenced.
#
# Launch detached:
#   setsid nohup bash scripts/r5l_entry_warm.sh \
#     > runs/r5l_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
echo "=== r5l start $(date) ==="
for i in $(seq 1 1080); do
  grep -q "r5j ALL DONE" runs/r5j_queue.log 2>/dev/null && break
  sleep 10
done
echo "=== warm entry() compile $(date) ==="
timeout 5400 python - > runs/r5l_entry_warm.log 2>&1 <<'PY'
import time
import jax
import __graft_entry__ as g

fn, args = g.entry()
jfn = jax.jit(fn)
t0 = time.perf_counter()
out = jax.device_get(jfn(*args))
print(f"entry() compile+run {time.perf_counter()-t0:.1f}s "
      f"out_shape={out.shape} backend={jax.devices()[0].platform}")
t0 = time.perf_counter()
out = jax.device_get(jfn(*args))
print(f"warm repeat {time.perf_counter()-t0:.3f}s")
print("ENTRY_WARM_OK")
PY
tail -3 runs/r5l_entry_warm.log
echo "=== r5l ALL DONE $(date) ==="
