"""Shared capture hardening for bench.py / bench_serve.py.

The tunnel backend has been observed to hang *forever* at init (0 CPU,
killed after 25 min in the round-3 capture). A blocked jax.devices() in the
bench process cannot be interrupted, so availability is probed in a
subprocess with a hard timeout; only after it succeeds does the bench touch
the backend in-process. On terminal failure the bench prints ONE parseable
JSON line with backend_unavailable=true — machine-distinguishable from a
perf regression — and exits 0.
"""

import json
import os
import subprocess
import sys
import time

PROBE_ATTEMPTS = int(os.environ.get("LORA_BENCH_PROBE_ATTEMPTS", "5"))
PROBE_TIMEOUT_S = int(os.environ.get("LORA_BENCH_PROBE_TIMEOUT", "150"))
PROBE_BACKOFF_S = int(os.environ.get("LORA_BENCH_PROBE_BACKOFF", "10"))


def probe_backend():
    """Bounded-retry backend probe. Returns None on success, else an error
    string describing the terminal failure (timeouts count)."""
    last = "unknown"
    for attempt in range(PROBE_ATTEMPTS):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform)"],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S)
            if r.returncode == 0:
                return None
            last = (r.stderr or r.stdout).strip()[-400:]
        except subprocess.TimeoutExpired:
            last = f"backend init hung >{PROBE_TIMEOUT_S}s (probe killed)"
        time.sleep(PROBE_BACKOFF_S * (attempt + 1))
    return last


def emit_unavailable(metric: str, err: str, **extra):
    print(json.dumps({
        "metric": metric, "value": None,
        "backend_unavailable": True, "error": err[-400:], **extra,
    }))


def require_backend_or_exit(metric: str, **extra):
    err = probe_backend()
    if err is not None:
        emit_unavailable(metric, err, **extra)
        sys.exit(0)
