"""Minimal WFDB record reader (format 212), replacing the `wfdb` dependency.

The reference reads PhysioNet records via `wfdb.rdrecord(..., physical=False)
.d_signal` (reference: local_utils/local_utils.py:19-38,47-65). MIT-BIH
Arrhythmia and Noise-Stress-Test records are stored in WFDB format 212
(two 12-bit two's-complement samples packed into 3 bytes). This module
parses the `.hea` header and unpacks the `.dat` payload to the raw digital
signal (equivalent to wfdb's `d_signal`), with no external dependency.

Only what the pipeline needs is implemented: single-segment records, format
212, arbitrary channel count.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class WfdbHeader:
    record_name: str
    n_sig: int
    fs: float
    sig_len: int
    file_names: list
    formats: list


def read_header(hea_path: str) -> WfdbHeader:
    with open(hea_path, "r") as f:
        lines = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    first = lines[0].split()
    record_name = first[0].split("/")[0]
    n_sig = int(first[1])
    fs = float(first[2]) if len(first) > 2 else 250.0
    sig_len = int(first[3]) if len(first) > 3 else 0
    file_names, formats = [], []
    for ln in lines[1 : 1 + n_sig]:
        parts = ln.split()
        file_names.append(parts[0])
        formats.append(parts[1].split("x")[0].split(":")[0].split("+")[0])
    return WfdbHeader(record_name, n_sig, fs, sig_len, file_names, formats)


def _unpack_212(raw: np.ndarray, n_samples_total: int) -> np.ndarray:
    """Unpack WFDB format 212: 3 bytes -> two 12-bit signed samples."""
    if raw.size % 3:
        raw = raw[: raw.size - raw.size % 3]
    b = raw.reshape(-1, 3).astype(np.int32)
    s0 = ((b[:, 1] & 0x0F) << 8) | b[:, 0]
    s1 = ((b[:, 1] & 0xF0) << 4) | b[:, 2]
    out = np.empty(b.shape[0] * 2, dtype=np.int32)
    out[0::2] = s0
    out[1::2] = s1
    out = np.where(out > 2047, out - 4096, out)  # 12-bit two's complement
    return out[:n_samples_total]


def rdrecord_digital(record_path: str) -> np.ndarray:
    """Read a WFDB record's digital signal, shape (sig_len, n_sig).

    `record_path` is the path without extension (like wfdb.rdrecord).
    Equivalent to wfdb.rdrecord(record_path, physical=False).d_signal for
    single-segment format-212 records.
    """
    hdr = read_header(record_path + ".hea")
    base_dir = os.path.dirname(record_path)
    if any(fmt != "212" for fmt in hdr.formats):
        raise NotImplementedError(f"only format 212 supported, got {hdr.formats}")
    if len(set(hdr.file_names)) != 1:
        raise NotImplementedError("multi-file records not supported")
    dat_path = os.path.join(base_dir, hdr.file_names[0])
    raw = np.fromfile(dat_path, dtype=np.uint8)
    flat = _unpack_212(raw, hdr.sig_len * hdr.n_sig)
    return flat.reshape(-1, hdr.n_sig)


# Record ids used by the reference data pipeline.
MITBIH_RECORDS = [
    100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 111, 112, 113, 114, 115,
    116, 117, 118, 119, 121, 122, 123, 124, 200, 201, 202, 203, 205, 207, 208,
    209, 210, 212, 213, 214, 215, 217, 219, 220, 221, 222, 223, 228, 230, 231,
    232, 233, 234,
]
NSTDB_NOISE_RECORDS = ["bw", "ma", "em"]
