"""lora_launch — the accelerate-launch/torchrun equivalent (lora_tpu.launch).

Reference counterpart: `accelerate launch train_lora_dreambooth.py`
(run_lora_db_unet_only.sh:6). The launcher spawns ranked processes with the
jax.distributed handshake env consumed by
parallel.mesh.initialize_distributed_from_env (the same call the trainer
CLIs make at startup)."""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_OK = """
from lora_tpu.parallel.mesh import initialize_distributed_from_env
joined = initialize_distributed_from_env()
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
assert joined and jax.process_count() == 2, jax.process_count()
mesh = Mesh(np.array(jax.devices()).reshape(4), ("dp",))
local = np.arange(2, dtype=np.float32) + 2 * jax.process_index()
g = jax.make_array_from_process_local_data(NamedSharding(mesh, P("dp")), local)
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(g)
print(f"RANK {jax.process_index()} sum={float(total)}")
"""


def _launch(*extra, worker):
    return subprocess.run(
        [sys.executable, "-m", "lora_tpu.launch", *extra, "--",
         sys.executable, "-c", worker],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO})


def test_launch_two_cpu_workers():
    """2 workers join one Gloo group via the CLI env handshake; a cross-
    process psum sees both processes' rows; output is rank-prefixed."""
    r = _launch("--nproc", "2", "--cpu-devices-per-proc", "2",
                worker=WORKER_OK)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "[p0] RANK 0 sum=6.0" in r.stdout
    assert "[p1] RANK 1 sum=6.0" in r.stdout


def test_launch_propagates_worker_failure():
    r = _launch("--nproc", "2", "--cpu-devices-per-proc", "1",
                worker="import sys, os;"
                       "sys.exit(3 if os.environ['LORA_TPU_PROCESS_ID'] == '1'"
                       " else 0)")
    assert r.returncode == 1
    assert "p1=rc3" in r.stderr


def test_launch_fail_fast_terminates_survivors():
    """Group-kill semantics (torchrun/accelerate parity): when one rank
    crashes hard, surviving ranks — which would otherwise block forever in
    their next collective against the dead peer — get SIGTERM (their
    preemption checkpoint fires), and the launcher exits non-zero promptly
    instead of hanging on wait()."""
    worker = ("import os, signal, sys, time\n"
              "if os.environ['LORA_TPU_PROCESS_ID'] == '1':\n"
              "    time.sleep(2)\n"   # let rank 0 register its handler
              "    os._exit(3)\n"  # hard crash: no atexit, like a segfault
              "def h(s, f):\n"
              "    print('SURVIVOR_TERM', flush=True)\n"
              "    sys.exit(0)\n"
              "signal.signal(signal.SIGTERM, h)\n"
              "time.sleep(300)\n")
    t0 = time.time()
    r = _launch("--nproc", "2", "--grace-s", "10", worker=worker)
    assert r.returncode == 1, r.stdout + r.stderr
    assert time.time() - t0 < 120  # fail-fast, not the worker's 300s sleep
    assert "p1 exited rc3" in r.stderr
    assert "SURVIVOR_TERM" in r.stdout


def test_launch_fail_fast_kills_hung_survivor_after_grace():
    """A survivor that ignores SIGTERM (hung in a collective) is SIGKILLed
    once the checkpoint grace period lapses — the launcher never hangs."""
    worker = ("import os, signal, time\n"
              "if os.environ['LORA_TPU_PROCESS_ID'] == '1':\n"
              "    time.sleep(2)\n"   # let rank 0 set SIG_IGN first
              "    os._exit(3)\n"
              "signal.signal(signal.SIGTERM, signal.SIG_IGN)\n"
              "print('HUNG_READY', flush=True)\n"
              "time.sleep(300)\n")
    t0 = time.time()
    r = _launch("--nproc", "2", "--grace-s", "3", worker=worker)
    assert r.returncode == 1, r.stdout + r.stderr
    assert time.time() - t0 < 120
    # SIGKILL shows up as a negative return code in the failure summary
    assert "p0=rc-9" in r.stderr


def test_launch_forwards_sigterm():
    """SIGTERM to the launcher reaches every rank (the preemption path:
    each rank's PreemptionGuard can checkpoint)."""
    worker = ("import signal, sys, time, os\n"
              "def h(s, f):\n"
              "    print('GOT_TERM rank', os.environ['LORA_TPU_PROCESS_ID'],"
              " flush=True)\n"
              "    sys.exit(0)\n"
              "signal.signal(signal.SIGTERM, h)\n"
              "print('READY', flush=True)\n"
              "time.sleep(300)\n")
    p = subprocess.Popen(
        [sys.executable, "-m", "lora_tpu.launch", "--nproc", "2", "--",
         sys.executable, "-c", worker],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO})
    # wait for both workers to be running (binary + non-blocking: a
    # text-mode non-blocking read trips the codec layer on empty reads)
    deadline = time.time() + 120
    seen = b""
    os.set_blocking(p.stdout.fileno(), False)
    while time.time() < deadline and seen.count(b"READY") < 2:
        chunk = p.stdout.read()
        if chunk:
            seen += chunk
        time.sleep(0.2)
    assert seen.count(b"READY") == 2, seen
    p.send_signal(signal.SIGTERM)
    os.set_blocking(p.stdout.fileno(), True)
    out, _ = p.communicate(timeout=120)
    text = (seen + (out or b"")).decode()
    assert p.returncode == 0, text
    assert "GOT_TERM rank 0" in text and "GOT_TERM rank 1" in text
