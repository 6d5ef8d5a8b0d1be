#!/usr/bin/env python
"""Measure the serving round-trip budget (VERDICT r2 weak item 4).

Starts no server itself — point it at a running cli/serve.py. Sends K warm
batch-N /denoise requests over ONE keep-alive connection and reports the
client-observed latency distribution plus the server's X-Denoise-Timing
breakdown (decode / pad / dispatch / fetch), which attributes the host vs
tunnel-vs-chip segments.

    python cli/serve.py --ckpt ... --use_pallas --warmup_max 64 &
    python scripts/serve_bench.py --batch 64 --iters 30
"""

import argparse
import http.client
import io
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((args.batch, 2, 256)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, x)
    payload = buf.getvalue()

    conn = http.client.HTTPConnection(args.host, args.port, timeout=600)
    conn.request("GET", "/healthz")
    meta = json.loads(conn.getresponse().read())

    lat, segs = [], []
    for i in range(args.warmup + args.iters):
        t0 = time.perf_counter()
        conn.request("POST", "/denoise", body=payload,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        body = r.read()
        dt = (time.perf_counter() - t0) * 1e3
        assert r.status == 200, body[:200]
        if i >= args.warmup:
            lat.append(dt)
            st = r.getheader("X-Denoise-Timing")
            if st:
                segs.append(json.loads(st))
    y = np.load(io.BytesIO(body))
    assert y.shape == x.shape

    lat = np.array(lat)
    out = {
        "inference_path": meta.get("inference_path"),
        "batch": args.batch,
        "iters": args.iters,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p90_ms": round(float(np.percentile(lat, 90)), 2),
        "min_ms": round(float(lat.min()), 2),
        "mean_ms": round(float(lat.mean()), 2),
    }
    if segs:
        for k in segs[0]:
            out[f"server_{k}_p50"] = round(
                float(np.percentile([s[k] for s in segs], 50)), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
