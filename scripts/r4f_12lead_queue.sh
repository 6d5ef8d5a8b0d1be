#!/usr/bin/env bash
# Round-4 item 7: drive the 12-lead path on REAL TPU hardware.
#   1. build the 12-lead ExternalData cache (CPU; fixed lead profile)
#   2. on-chip NewRale kernel test (ECG_TEST_TPU tier, -k newrale)
#   3. 10-epoch transfer-learning train (frozen pretrained core) ->
#      model_save/newrale/newrale_9_emb_intensity-4.msgpack
#   4. serve that checkpoint live (cli/serve.py, attention kernel) and
#      drive /denoise + /healthz with a 12-lead client batch
cd /root/repo
set -u
echo "=== 1: build ExternalData cache ==="
[ -f ExternalData/dict_data/ecg.npy ] || \
  timeout 3600 python cli/build_data.py --external \
    > runs/r4f_build_external.log 2>&1 || { echo BUILD_FAIL; exit 1; }
echo "=== 2: on-chip NewRale kernel test ==="
ECG_TEST_TPU=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py \
  -q -k newrale > runs/r4f_newrale_tpu_test.log 2>&1
echo "=== 3: 10-epoch 12-lead transfer train (frozen core) ==="
timeout 14400 python -u cli/transfer_learning.py --noise_type_index 3 \
  --intensity_index 0 --epochs 10 --batch_size 32 \
  > runs/r4f_transfer10.log 2>&1
CKPT=./model_save/newrale/newrale_9_emb_intensity-4.msgpack
[ -f "$CKPT" ] || { echo "NO_CKPT after transfer train"; exit 1; }
echo "=== 4: serve the 12-lead checkpoint live ==="
setsid nohup python -u cli/serve.py --model newrale --ckpt "$CKPT" \
  --use_pallas --port 8791 > runs/r4f_serve_12lead.log 2>&1 < /dev/null &
echo $! > /tmp/r4f_serve.pid
for i in $(seq 1 360); do
  grep -q "serving newrale" runs/r4f_serve_12lead.log 2>/dev/null && break
  sleep 5
done
timeout 1200 python - > runs/r4f_serve_client.log 2>&1 <<'PY'
import io, json, time, urllib.request
import numpy as np
import sys
sys.path.insert(0, ".")
base = "http://127.0.0.1:8791"
meta = json.load(urllib.request.urlopen(base + "/healthz", timeout=600))
print("healthz:", meta)
rng = np.random.default_rng(0)
x = rng.standard_normal((8, 12, 256)).astype(np.float32)
buf = io.BytesIO(); np.save(buf, x)
# first request compiles the bucket through the tunnel; second is warm
for tag in ("cold", "warm", "warm"):
    t0 = time.perf_counter()
    r = urllib.request.urlopen(
        urllib.request.Request(base + "/denoise", buf.getvalue()),
        timeout=1800)
    dt = (time.perf_counter() - t0) * 1e3
    y = np.load(io.BytesIO(r.read()))
    timing = r.headers.get("X-Denoise-Timing")
    print(f"{tag}: shape={y.shape} finite={bool(np.isfinite(y).all())} "
          f"client_ms={dt:.1f} server_timing={timing}")
print("SERVE_12LEAD_OK")
PY
kill "$(cat /tmp/r4f_serve.pid)" 2>/dev/null
echo R4F_12LEAD_DONE
