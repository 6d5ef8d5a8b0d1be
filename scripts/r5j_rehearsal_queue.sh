#!/usr/bin/env bash
# Round-5j: after the r5i re-warm (compile cache + data cache rebuilt),
# repopulate model_save/ and rehearse the full shipped loop once more on
# this container: 100-epoch flagship train (shipped defaults: kernel
# custom-VJP + bf16) -> eval-only restore -> live kernel-path serve with
# REAL test windows (SNR-improvement assert) -> multi-chip dryrun BOTH
# legs on the virtual CPU mesh. Sequenced because nproc=1.
#
# Launch detached (shell tasks die at 10 min):
#   setsid nohup bash scripts/r5j_rehearsal_queue.sh \
#     > runs/r5j_queue.log 2>&1 < /dev/null &
cd /root/repo
set -u
mkdir -p runs
echo "=== r5j start $(date) ==="

echo "=== 1: 100-epoch flagship train, shipped defaults $(date) ==="
timeout 14400 python -u cli/main.py --model_index 4 --noise_type_index 3 \
  --intensity_index 0 --epochs 100 --batch_size 32 \
  > runs/r5j_train_ralenet.log 2>&1
CKPT=./model_save/ralenet/ralenet_99_emb_intensity-4.msgpack
[ -f "$CKPT" ] || { echo "NO_CKPT after train"; exit 1; }

echo "=== 2: eval-only restore of the saved checkpoint $(date) ==="
timeout 3600 python scripts/eval_ckpt.py --model_index 4 \
  --noise_type_index 3 --intensity_index 0 --ckpt "$CKPT" \
  > runs/r5j_eval_ckpt.log 2>&1

echo "=== 3: live serve rehearsal (kernel path = TPU default) $(date) ==="
setsid nohup python -u cli/serve.py --ckpt "$CKPT" --port 8794 \
  > runs/r5j_serve.log 2>&1 < /dev/null &
echo $! > /tmp/r5j_serve.pid
for i in $(seq 1 360); do
  grep -q "serving ralenet" runs/r5j_serve.log 2>/dev/null && break
  sleep 5
done
timeout 7200 python - > runs/r5j_serve_client.log 2>&1 <<'PY'
import io, json, time, urllib.request
import numpy as np
import sys
sys.path.insert(0, ".")
from ecg_denoise_tpu.data.dataset import load_split_arrays
from ecg_denoise_tpu.metrics.denoise import SNR

base = "http://127.0.0.1:8794"
meta = json.load(urllib.request.urlopen(base + "/healthz", timeout=7200))
print("healthz:", meta)
_, _, te_n, te_c = load_split_arrays("emb", -4, n_select=10_000, seed=2023)
x, c = np.asarray(te_n[:64], np.float32), np.asarray(te_c[:64], np.float32)
buf = io.BytesIO(); np.save(buf, x)
for tag in ("cold", "warm", "warm"):
    t0 = time.perf_counter()
    r = urllib.request.urlopen(
        urllib.request.Request(base + "/denoise", buf.getvalue()),
        timeout=7200)
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
kill "$(cat /tmp/r5j_serve.pid)" 2>/dev/null

echo "=== 4: multi-chip dryrun, XLA leg + kernel leg $(date) ==="
timeout 3600 python - > runs/r5j_dryrun.log 2>&1 <<'PY'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("DRYRUN_BOTH_LEGS_OK")
PY

echo "=== r5j ALL DONE $(date) ==="
