#!/usr/bin/env python
"""Generate the committed miniature PhysioNet tree (tests/data/mini_physionet).

Real MIT-BIH/NSTDB files are not downloadable in this environment, so the
end-to-end real-data rehearsal (VERDICT r4 item 8; tests/test_wfdb_e2e.py)
runs against this committed miniature: two arrhythmia records (100, 101 —
ids from wfdb_io.MITBIH_RECORDS so the builder's discovery loop finds them)
in genuine WFDB format 212 with a beat .atr for record 100, plus the three
NSTDB noise records. 16,384 samples each (= 2 builder stretches -> 64
windows/record), ~245 KB total.

Deterministic: synthetic generator at fixed seeds, digitised to the 12-bit
digital range like real MIT-BIH (gain 200 units/mV). Re-running this script
must reproduce the committed bytes exactly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ecg_denoise_tpu.data import synth, wfdb_io

T = 16_384  # 2 stretches of 256*32 samples
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "mini_physionet")


def digitise(x: np.ndarray, scale: float) -> np.ndarray:
    d = np.clip(np.round(x * scale), -2048, 2047).astype(np.int32)
    return d


def main():
    arr_dir = os.path.join(OUT, "mit-bih-arrhythmia-database-1.0.0")
    nst_dir = os.path.join(OUT, "mit-bih-noise-stress-test-database-1.0.0")
    os.makedirs(arr_dir, exist_ok=True)
    os.makedirs(nst_dir, exist_ok=True)

    for i, rid in enumerate([100, 101]):
        sig = synth.synth_ecg_record(7_000 + i, n_channels=2)[:T]
        # Synth records are O(1) amplitude; 400 units/mV-ish keeps good
        # 12-bit resolution with headroom.
        dig = digitise(sig, 400.0)
        wfdb_io.wrsamp_212(os.path.join(arr_dir, str(rid)), dig)

    # Beat annotations for record 100: R peaks of the digitised lead 0 via
    # a plain local-max scan (fixture-grade; the detector quality is tested
    # elsewhere), alternating a V every 8th beat like real ectopy.
    sig0 = wfdb_io.rdrecord_digital(os.path.join(arr_dir, "100"))[:, 0]
    thr = np.percentile(sig0, 99)
    peaks = []
    last = -400
    for t in range(1, T - 1):
        if sig0[t] >= thr and sig0[t] >= sig0[t - 1] and sig0[t] > sig0[t + 1]:
            if t - last >= 100:
                peaks.append(t)
                last = t
    symbols = ["V" if j % 8 == 7 else "N" for j in range(len(peaks))]
    wfdb_io.wrann(os.path.join(arr_dir, "100"), peaks, symbols)

    for j, kind in enumerate(["bw", "ma", "em"]):
        noise = synth.synth_noise_record(kind, 8_000, n_channels=2)[:T]
        dig = digitise(noise, 400.0)
        wfdb_io.wrsamp_212(os.path.join(nst_dir, kind), dig)

    n_files = sum(len(fs) for _, _, fs in os.walk(OUT))
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(OUT) for f in fs)
    print(f"mini_physionet: {n_files} files, {size / 1024:.0f} KB, "
          f"{len(peaks)} beats annotated on 100")


if __name__ == "__main__":
    main()
