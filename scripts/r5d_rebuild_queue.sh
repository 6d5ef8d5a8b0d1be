#!/usr/bin/env bash
# Round-5d: the container rebuild wiped the gitignored artifacts (data
# caches, model_save/). Rebuild them and rehearse the full shipped loop
# on the CURRENT tree + CURRENT defaults (kernel custom-VJP trainer,
# bf16): cache build -> 100-epoch flagship train -> eval-only restore ->
# live kernel-path serve driven over a real socket with REAL test-set
# noisy windows (SNR-improvement check, not just shape/finite).
#
# Launch detached (shell tasks die at 10 min):
#   setsid nohup bash scripts/r5d_rebuild_queue.sh \
#     > runs/r5d_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
mkdir -p runs
echo "=== r5d start $(date) ==="
# 0. let the r5c warm queue finish first (shares the chip + 1 CPU core)
for i in $(seq 1 720); do
  grep -q "r5c ALL DONE" runs/r5c_warm.log 2>/dev/null && break
  sleep 10
done
echo "=== 1: build base data cache $(date) ==="
[ -f data/dict_data/ecg.npy ] || timeout 7200 python cli/build_data.py \
  > runs/r5d_build_data.log 2>&1 || { echo BUILD_FAIL; exit 1; }
echo "=== 2: 100-epoch flagship train, shipped defaults $(date) ==="
timeout 14400 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --batch_size 32 \
  > runs/r5d_train_ralenet.log 2>&1
CKPT=./model_save/ralenet/ralenet_99_emb_intensity-4.msgpack
[ -f "$CKPT" ] || { echo "NO_CKPT after train"; exit 1; }
echo "=== 3: eval-only restore of the saved checkpoint $(date) ==="
timeout 3600 python scripts/eval_ckpt.py --model_index 4 \
  --noise_type_index 3 --intensity_index 0 --ckpt "$CKPT" \
  > runs/r5d_eval_ckpt.log 2>&1
echo "=== 4: live serve rehearsal (kernel path = TPU default) $(date) ==="
setsid nohup python -u cli/serve.py --ckpt "$CKPT" --port 8793 \
  > runs/r5d_serve.log 2>&1 < /dev/null &
echo $! > /tmp/r5d_serve.pid
for i in $(seq 1 360); do
  grep -q "serving ralenet" runs/r5d_serve.log 2>/dev/null && break
  sleep 5
done
timeout 1800 python - > runs/r5d_serve_client.log 2>&1 <<'PY'
import io, json, time, urllib.request
import numpy as np
import sys
sys.path.insert(0, ".")
from ecg_denoise_tpu.data.dataset import load_split_arrays
from ecg_denoise_tpu.metrics.denoise import SNR

base = "http://127.0.0.1:8793"
meta = json.load(urllib.request.urlopen(base + "/healthz", timeout=600))
print("healthz:", meta)
_, _, te_n, te_c = load_split_arrays("emb", -4, n_select=10_000, seed=2023)
x, c = np.asarray(te_n[:64], np.float32), np.asarray(te_c[:64], np.float32)
buf = io.BytesIO(); np.save(buf, x)
for tag in ("cold", "warm", "warm"):
    t0 = time.perf_counter()
    r = urllib.request.urlopen(
        urllib.request.Request(base + "/denoise", buf.getvalue()),
        timeout=1800)
    dt = (time.perf_counter() - t0) * 1e3
    y = np.load(io.BytesIO(r.read()))
    print(f"{tag}: shape={y.shape} finite={bool(np.isfinite(y).all())} "
          f"client_ms={dt:.1f} "
          f"server_timing={r.headers.get('X-Denoise-Timing')}")
s_in = float(np.mean(np.asarray(SNR(c, x))))
s_out = float(np.mean(np.asarray(SNR(c, np.asarray(y, np.float32)))))
print(f"input_snr={s_in:.2f} dB -> served_output_snr={s_out:.2f} dB")
assert s_out > s_in + 10, "served output should improve SNR by >10 dB"
print("SERVE_REHEARSAL_OK")
PY
kill "$(cat /tmp/r5d_serve.pid)" 2>/dev/null
echo "=== r5d ALL DONE $(date) ==="
