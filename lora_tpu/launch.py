"""Multi-process launcher — the `accelerate launch` / torchrun equivalent.

The reference's only distributed path is `accelerate launch
train_lora_dreambooth.py ...` (run_lora_db_unet_only.sh:6), which spawns N
ranked processes and wires the torch.distributed handshake. This is the
TPU-native counterpart: it spawns N local worker processes with the
`jax.distributed` coordination environment prewired
(LORA_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID, consumed by
parallel.mesh.initialize_distributed_from_env in the trainer CLIs) and
supervises them — streaming each child's output with a `[pN]` prefix,
forwarding SIGTERM (and translating a SIGINT/Ctrl-C into SIGTERM) to every
child so the graceful preemption checkpoint fires in all ranks
(training/checkpoint.PreemptionGuard handles SIGTERM), failing FAST when
any rank dies — surviving ranks would otherwise block forever in their
next collective, so they get SIGTERM, a grace period to checkpoint, then
SIGKILL — and exiting non-zero if any child failed. Workers run in their
own process group so a terminal Ctrl-C reaches them exactly once, via the
launcher's translation, not also raw from the tty.

Usage:
  lora_launch --nproc 2 -- lora_db --instance_data_dir ... --data_parallel
  lora_launch --nproc 2 --cpu-devices-per-proc 4 -- python -m ...   # CPU
                                                   # rehearsal of multihost

On a real TPU pod each host already runs exactly one process and
`jax.distributed.initialize()` auto-discovers the topology — this launcher
is for multi-process-per-host setups and for rehearsing multihost runs on
CPU (Gloo collectives over localhost).
"""

from __future__ import annotations

import argparse
import os
import shutil
import signal
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _stream(proc: subprocess.Popen, tag: str) -> None:
    for line in proc.stdout:
        sys.stdout.write(f"[{tag}] {line}")
        sys.stdout.flush()


def _supervise(procs, grace_s: float = 30.0, poll_s: float = 0.2):
    """Wait on all workers, failing FAST: the moment any rank exits
    non-zero, surviving ranks (stranded in their next collective by the
    dead peer) get SIGTERM, `grace_s` seconds to run their preemption
    checkpoint, then SIGKILL — torchrun/accelerate group-kill semantics
    rather than a launcher hung on `wait()` forever."""
    import time

    while True:
        rcs = [p.poll() for p in procs]
        failed = any(rc not in (None, 0) for rc in rcs)
        if all(rc is not None for rc in rcs):
            return rcs
        if failed:
            break
        time.sleep(poll_s)
    crashed = [(i, rc) for i, rc in enumerate(rcs) if rc not in (None, 0)]
    print(f"lora_launch: "
          f"{', '.join(f'p{i} exited rc{rc}' for i, rc in crashed)}; "
          f"terminating surviving ranks (grace {grace_s:.0f}s)",
          file=sys.stderr)
    for p in procs:
        if p.poll() is None:
            p.terminate()
    deadline = time.monotonic() + grace_s
    for p in procs:
        if p.poll() is None:
            try:
                p.wait(timeout=max(deadline - time.monotonic(), 0.1))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
    return [p.poll() for p in procs]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="lora_launch",
        description="Spawn N jax.distributed worker processes "
                    "(accelerate-launch equivalent).")
    ap.add_argument("--nproc", type=int, required=True,
                    help="number of worker processes")
    ap.add_argument("--port", type=int, default=0,
                    help="coordinator port (0 = pick a free one)")
    ap.add_argument("--grace-s", type=float, default=30.0,
                    help="on a rank failure, seconds surviving ranks get "
                         "to run their preemption checkpoint (SIGTERM) "
                         "before SIGKILL")
    ap.add_argument("--cpu-devices-per-proc", type=int, default=0,
                    help="CPU rehearsal: give each process this many "
                         "virtual CPU devices (sets XLA_FLAGS + pins the "
                         "cpu backend in-process)")
    ap.add_argument("command", nargs=argparse.REMAINDER,
                    help="worker command after `--` (console script or "
                         "python -m ...)")
    args = ap.parse_args(argv)

    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("missing worker command (put it after `--`)")
    # console scripts resolve through PATH; fall back to python -m for
    # module-style targets
    if shutil.which(cmd[0]) is None and cmd[0] != sys.executable:
        ap.error(f"worker command {cmd[0]!r} not found on PATH")

    port = args.port or _free_port()
    procs, threads = [], []
    for pid in range(args.nproc):
        env = dict(os.environ)
        env["LORA_TPU_COORDINATOR"] = f"localhost:{port}"
        env["LORA_TPU_NUM_PROCESSES"] = str(args.nproc)
        env["LORA_TPU_PROCESS_ID"] = str(pid)
        if args.cpu_devices_per_proc:
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "") +
                f" --xla_force_host_platform_device_count="
                f"{args.cpu_devices_per_proc}").strip()
            env["LORA_TPU_PLATFORM"] = "cpu"
        # own process group: the tty's Ctrl-C must not hit workers raw
        # (KeyboardInterrupt mid-step, no checkpoint) — it reaches them
        # only as the launcher's SIGTERM translation below
        p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True,
                             start_new_session=True)
        procs.append(p)
        t = threading.Thread(target=_stream, args=(p, f"p{pid}"),
                             daemon=True)
        t.start()
        threads.append(t)

    def forward(signum, _frame):
        # preemption/interrupt reaches every rank so each checkpoints;
        # SIGINT is translated to SIGTERM — the graceful-checkpoint
        # signal PreemptionGuard actually handles
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)

    old_term = signal.signal(signal.SIGTERM, forward)
    old_int = signal.signal(signal.SIGINT, forward)
    try:
        rcs = _supervise(procs, grace_s=args.grace_s)
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
        for p in procs:
            if p.poll() is None:
                p.kill()
        for t in threads:
            t.join(timeout=5)

    bad = [(i, rc) for i, rc in enumerate(rcs) if rc != 0]
    if bad:
        print(f"lora_launch: worker(s) failed: "
              f"{', '.join(f'p{i}=rc{rc}' for i, rc in bad)}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
