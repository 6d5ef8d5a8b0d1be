"""Run logging — the `train_log` decorator equivalent.

The reference wraps `train()` in an external `@train_log()` decorator from
the unvendored `global_utils` package (reference denoise_train.py:9,14; the
package also ships `Logger`/`easymail`, imported unused at main.py:14).
This version records, per run: timestamp, function, kwargs of record
(model/noise/epochs), wall time, and outcome — appended as one JSON line to
`train_log.jsonl` so sweeps remain greppable.

Notification (the `easymail` equivalent): if ECG_NOTIFY_CMD is set, the
finished record is piped to that shell command's stdin after every run
(success or failure). An SMTP notifier would be dead code in a zero-egress
training environment; a command hook composes with whatever transport the
operator has (mailx, a queue writer, a local webhook relay). Failures of
the hook never fail the run.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import time
from datetime import datetime
from typing import Callable


def train_log(log_file: str = "./train_log.jsonl") -> Callable:
    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            rec = {
                "ts": datetime.now().isoformat(timespec="seconds"),
                "fn": fn.__name__,
                "kwargs": {
                    k: v
                    for k, v in kwargs.items()
                    if isinstance(v, (str, int, float, bool))
                },
            }
            t0 = time.time()
            try:
                out = fn(*args, **kwargs)
                rec["status"] = "ok"
                return out
            except Exception as e:  # noqa: BLE001 — log then re-raise
                rec["status"] = f"error: {type(e).__name__}: {e}"
                raise
            finally:
                rec["wall_s"] = round(time.time() - t0, 2)
                line = json.dumps(rec)
                try:
                    with open(log_file, "a") as f:
                        f.write(line + "\n")
                except OSError:
                    pass
                _notify(line)

        return wrapper

    return deco


def _notify(line: str) -> None:
    """Pipe the run record to ECG_NOTIFY_CMD, if configured (best-effort).

    Fire-and-forget: the hook gets the record on stdin and runs detached —
    a slow or hung notifier must not delay queued runs' teardown (ADVICE
    r4; the hook is operator-controlled and best-effort by contract)."""
    cmd = os.environ.get("ECG_NOTIFY_CMD")
    if not cmd:
        return
    try:
        proc = subprocess.Popen(cmd, shell=True, stdin=subprocess.PIPE,
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL,
                                start_new_session=True)
        if proc.stdin is not None:
            try:
                proc.stdin.write(line.encode())
                proc.stdin.close()
            except (BrokenPipeError, OSError):
                pass
    except (OSError, subprocess.SubprocessError):
        pass
