#!/usr/bin/env bash
# Round-5h: retry the 12-lead live-serve leg of the r5g rehearsal. The
# r5g client was killed by its own `timeout 1200` wrapper mid cold
# compile (rebuilt container = cold compile cache; the 12-lead bucket
# compile exceeded 20 min through the tunnel). Same recipe, 2 h budget.
#
# Launch detached:
#   setsid nohup bash scripts/r5h_serve12_retry.sh \
#     > runs/r5h_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
CKPT=./model_save/newrale/newrale_9_emb_intensity-4.msgpack
[ -f "$CKPT" ] || { echo "NO_CKPT"; exit 1; }
echo "=== r5h serve retry $(date) ==="
setsid nohup python -u cli/serve.py --model newrale --ckpt "$CKPT" \
  --port 8792 > runs/r5h_serve_12lead.log 2>&1 < /dev/null &
echo $! > /tmp/r5h_serve.pid
for i in $(seq 1 360); do
  grep -q "serving newrale" runs/r5h_serve_12lead.log 2>/dev/null && break
  sleep 5
done
timeout 7200 python - > runs/r5h_serve_client.log 2>&1 <<'PY'
import io, json, time, urllib.request
import numpy as np
base = "http://127.0.0.1:8792"
meta = json.load(urllib.request.urlopen(base + "/healthz", timeout=600))
print("healthz:", meta)
rng = np.random.default_rng(0)
x = rng.standard_normal((8, 12, 256)).astype(np.float32)
buf = io.BytesIO(); np.save(buf, x)
for tag in ("cold", "warm", "warm"):
    t0 = time.perf_counter()
    r = urllib.request.urlopen(
        urllib.request.Request(base + "/denoise", buf.getvalue()),
        timeout=6600)
    dt = (time.perf_counter() - t0) * 1e3
    y = np.load(io.BytesIO(r.read()))
    timing = r.headers.get("X-Denoise-Timing")
    print(f"{tag}: shape={y.shape} finite={bool(np.isfinite(y).all())} "
          f"client_ms={dt:.1f} server_timing={timing}")
print("SERVE_12LEAD_OK")
PY
kill "$(cat /tmp/r5h_serve.pid)" 2>/dev/null
echo "=== r5h ALL DONE $(date) ==="
