"""Device mesh + sharding rules.

The reference's only parallelism is accelerate/NCCL DDP
(train_lora_dreambooth.py:489-494, SURVEY §2.3). The TPU-native equivalent:
a jax.sharding.Mesh over ICI with

  - dp:   batch axis sharding (DDP equivalent; LoRA/TI grads are psum'ed
          automatically by pjit — and since the base is frozen, that is the
          ONLY gradient traffic)
  - fsdp: optional sharding of the frozen base weights across devices
          (pure HBM savings: weights are all-gathered per-use, never
          grad-synced)
  - tp:   optional tensor parallelism of attention/FFN matmuls via weight
          PartitionSpecs; XLA inserts the collectives

Multi-slice (DCN) falls out of the same Mesh abstraction via
jax.distributed.initialize, which `initialize_distributed` wraps.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (no-op on a single host)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def initialize_distributed_from_env() -> bool:
    """Join the process group described by ``lora_tpu.launch``'s environment
    (LORA_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID) — the torchrun /
    `accelerate launch` handshake, called by the trainer CLIs before first
    jax use. Returns True when a multi-process group was joined. On TPU
    pods with no launcher env this is a no-op: jax.distributed.initialize()
    without args already auto-discovers the pod topology when needed.

    LORA_TPU_PLATFORM=cpu additionally pins the CPU backend in-process
    (rehearsal mode: this environment's sitecustomize clobbers JAX_PLATFORMS
    env overrides, so the launcher can't use the env var)."""
    import os

    platform = os.environ.get("LORA_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    coord = os.environ.get("LORA_TPU_COORDINATOR")
    if not coord:
        return False
    nproc = int(os.environ["LORA_TPU_NUM_PROCESSES"])
    # deliberately NOT the error-swallowing wrapper: a failed handshake must
    # CRASH the rank, not silently degrade it to an independent
    # single-process run that believes it is main and writes into the
    # shared output dir (split-brain)
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=nproc,
        process_id=int(os.environ["LORA_TPU_PROCESS_ID"]),
    )
    if jax.process_count() != nproc:
        raise RuntimeError(
            f"distributed handshake joined {jax.process_count()} processes, "
            f"launcher expected {nproc}")
    return nproc > 1


def is_main_process() -> bool:
    """Checkpoint/log gating under multi-process: only process 0 writes to
    the shared output dir (the accelerate `is_main_process` equivalent,
    train_lora_dreambooth.py:895 — concurrent whole-file writes from every
    rank would corrupt artifacts)."""
    return jax.process_index() == 0


_BARRIER_SEQ: Dict[str, int] = {}


def multihost_barrier(name: str = "barrier", timeout_s: float = 1800.0) -> None:
    """All processes wait here (no-op single-process) — e.g. non-main ranks
    wait for main's class-image generation before building the dataset.

    Rides the coordination-service gRPC barrier, NOT an array collective:
    `sync_global_devices` allgathers through the CPU/Gloo transport, whose
    context handshake has a hard ~30 s timeout — a rank stuck in a long
    compile (class-image generation is minutes on a cold cache) blows
    straight past it and takes the whole group down. The service barrier
    parks the waiters for up to `timeout_s` at zero cost. Barrier ids are
    single-use in the coordination service, so each call gets a
    per-name sequence suffix (all ranks execute the same barrier sequence,
    keeping the suffix globally consistent)."""
    if jax.process_count() > 1:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            seq = _BARRIER_SEQ.get(name, 0)
            _BARRIER_SEQ[name] = seq + 1
            client.wait_at_barrier(f"lora_tpu:{name}:{seq}",
                                   timeout_in_ms=int(timeout_s * 1000))
            return
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def warm_collectives(mesh: Optional[Mesh]) -> None:
    """Establish the cross-process collective transport while ranks are in
    LOCKSTEP. CPU/Gloo contexts are created lazily at a collective's first
    execution, with a hard ~30 s key-exchange window; deferred to the first
    real train step, that window opens right after each rank's train-step
    compile, and compile wall time skews across ranks (host contention,
    per-rank compile-cache asymmetry) by more than the window. One process
    allgather (the PreemptionCoordinator / sync-point context) and one
    tiny all-device reduce (the training-psum context) here cost
    milliseconds and are reused by every later collective. No-op
    single-process; on TPU pods ICI channels need no handshake and this is
    a cheap sanity ping."""
    if mesh is None or jax.process_count() <= 1:
        return
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lora_tpu:warm_collectives")
    n = int(mesh.devices.size)
    sh = NamedSharding(mesh, P(mesh.axis_names))
    arr = jax.make_array_from_callback(
        (n,), sh, lambda idx: np.zeros((1,), np.float32))
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    jax.block_until_ready(out)
    # Contexts are keyed by DEVICE GROUP, so the all-device reduce above
    # does not cover single-axis collectives: a grad psum over dp in a
    # dp x fsdp mesh runs one context per fsdp index (e.g. devices
    # {1,3,...} spanning processes). One explicit psum per mesh axis
    # creates exactly those groupings.
    for ax in mesh.axis_names:
        if mesh.shape[ax] == 1:
            continue
        rest = tuple(a for a in mesh.axis_names if a != ax)
        f = jax.shard_map(lambda x, a=ax: jax.lax.psum(x, a), mesh=mesh,
                          in_specs=P(mesh.axis_names), out_specs=P(rest))
        jax.block_until_ready(jax.jit(f)(arr))


class PreemptionCoordinator:
    """Multihost-consistent preemption decision.

    Under multi-process, SIGTERM lands on each rank at a slightly different
    wall time (and on a real pod a maintenance preemption may hit only SOME
    hosts); if ranks acted on their LOCAL flag they could break out of the
    training loop at different steps, leaving peers blocked in the next
    collective. All ranks instead agree on the OR of every rank's flag —
    an any-reduce (allgather of the local flags) sampled every `every`
    micro-steps — so a signal delivered to any subset of hosts stops the
    whole group at the same step, and process 0 checkpoints even when the
    signal never reached it. The reduce is a blocking host sync — keep
    `every` >= ~10 in production; detection latency is every/steps_per_sec,
    well inside preemption grace periods. Single-process: the local flag,
    zero overhead."""

    def __init__(self, every: int = 10):
        self.every = max(int(every), 1)
        self.nproc = jax.process_count()
        self._agreed = False

    def should_stop(self, local_flag: bool, step: int) -> bool:
        if self.nproc == 1:
            return local_flag
        if not self._agreed and step % self.every == 0:
            from jax.experimental import multihost_utils

            self._agreed = bool(np.asarray(
                multihost_utils.process_allgather(
                    np.asarray(local_flag))).any())
        return self._agreed


def make_mesh(
    dp: int = -1, fsdp: int = 1, tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with axes (dp, fsdp, tp); dp=-1 consumes the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        dp = n // (fsdp * tp)
    if dp * fsdp * tp != n:
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} != {n} devices")
    arr = np.array(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "dp")))
    return NamedSharding(mesh, P("dp"))


def data_parallel_size(mesh: Optional[Mesh]) -> int:
    """Number of data-parallel ways (dcn slices x in-slice dp)."""
    if mesh is None:
        return 1
    dp = mesh.shape["dp"]
    if "dcn" in mesh.axis_names:
        dp *= mesh.shape["dcn"]
    return dp


def make_multislice_mesh(
    dp: int = -1, fsdp: int = 1, tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice mesh: a leading `dcn` axis spans slices (data parallelism
    over the slow inter-slice network — only the ~MB-sized LoRA/TI grad
    all-reduce crosses it), while dp/fsdp/tp live inside each slice on ICI.
    With one slice this degenerates to a dcn=1 mesh, so callers can use it
    unconditionally. Slice topology comes from the devices' own
    `slice_index` (jax.Device), the mechanism the scaling playbook
    prescribes for DCN-aware layouts."""
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
    n_slices = max(len(slice_ids), 1)
    per_slice = len(devices) // n_slices
    if per_slice * n_slices != len(devices):
        raise ValueError(
            f"uneven slices: {len(devices)} devices over {n_slices} slices")
    if dp == -1:
        dp = per_slice // (fsdp * tp)
    if dp * fsdp * tp != per_slice:
        raise ValueError(
            f"in-slice mesh {dp}x{fsdp}x{tp} != {per_slice} devices/slice")
    if n_slices == 1:
        arr = np.array(devices).reshape(1, dp, fsdp, tp)
    else:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (dp, fsdp, tp), (n_slices, 1, 1), devices,
            allow_split_physical_axes=True,
        ).reshape(n_slices, dp, fsdp, tp)
    return Mesh(arr, ("dcn", "dp", "fsdp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# regex -> PartitionSpec factory for tensor parallelism over the tp axis.
# Column-parallel (shard out_features, axis 0): q/k/v, GEGLU proj, fc1.
# Row-parallel (shard in_features, axis 1): attention out, ff out, fc2.
_TP_RULES: Tuple[Tuple[str, Tuple[Optional[str], ...]], ...] = (
    (r"\.to_q\.weight$", ("tp", None)),
    (r"\.to_k\.weight$", ("tp", None)),
    (r"\.to_v\.weight$", ("tp", None)),
    (r"\.(q|k|v)_proj\.weight$", ("tp", None)),
    (r"\.ff\.net\.0\.proj\.weight$", ("tp", None)),
    (r"\.mlp\.fc1\.weight$", ("tp", None)),
    (r"\.to_out\.0\.weight$", (None, "tp")),
    (r"\.out_proj\.weight$", (None, "tp")),
    (r"\.ff\.net\.2\.weight$", (None, "tp")),
    (r"\.mlp\.fc2\.weight$", (None, "tp")),
)


def param_pspec(name: str, shape: Tuple[int, ...], mesh: Mesh,
                use_fsdp: bool = False, use_tp: bool = False) -> P:
    """PartitionSpec for one base weight."""
    spec = [None] * len(shape)
    if use_tp and mesh.shape["tp"] > 1:
        for pat, tp_spec in _TP_RULES:
            if re.search(pat, name):
                for i, ax in enumerate(tp_spec):
                    if ax and shape[i] % mesh.shape["tp"] == 0:
                        spec[i] = ax
                break
    if use_fsdp and mesh.shape["fsdp"] > 1:
        # shard the largest still-free axis that divides evenly
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % mesh.shape["fsdp"] == 0 and shape[i] > 1:
                spec[i] = "fsdp"
                break
    return P(*spec)


def shard_params(params: Dict[str, jax.Array], mesh: Mesh,
                 use_fsdp: bool = False, use_tp: bool = False) -> Dict[str, jax.Array]:
    """Place a flat param dict onto the mesh per the rules above."""
    out = {}
    for name, w in params.items():
        pspec = param_pspec(name, w.shape, mesh, use_fsdp, use_tp)
        out[name] = jax.device_put(w, NamedSharding(mesh, pspec))
    return out


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_batch_array(x, sharding):
    """Place one batch array onto a (possibly multi-host) batch sharding.

    Single-process: plain device_put. Multi-process: `x` holds THIS
    process's rows of the global batch, and the global array is assembled
    with jax.make_array_from_process_local_data — device_put of local rows
    against a global sharding would mis-size the batch (each process only
    addresses its own devices). Already-correctly-sharded jax.Arrays pass
    through untouched (the trainers prefetch-then-shard)."""
    if (isinstance(x, jax.Array) and getattr(x, "sharding", None) == sharding):
        return x
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np

    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Batch arrays hold the GLOBAL batch on a single process, or this
    process's local rows under multi-process (global = local x
    process_count)."""
    dp = data_parallel_size(mesh)
    nproc = jax.process_count()
    for name, v in batch.items():
        already_global = (isinstance(v, jax.Array)
                          and not v.is_fully_addressable)
        global_rows = (v.shape[0] if nproc == 1 or already_global
                       else v.shape[0] * nproc)
        if global_rows % dp != 0:
            raise ValueError(
                f"global batch axis of {name!r} ({global_rows}) is not "
                f"divisible by dp={dp}. Batch semantics are per-chip: the "
                f"global batch is train_batch_size x dp, so pass the loader "
                f"a multiple of dp (the trainers do this automatically)."
            )
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_batch_array(x, sh), batch)


def mesh_from_flags(data_parallel: bool = False, fsdp: int = 1,
                    tp: int = 1) -> Optional[Mesh]:
    """Trainer-facing mesh construction. Returns None when no parallelism is
    requested (or only one device exists), else a (dp, fsdp, tp) mesh where
    dp consumes the devices left over after fsdp*tp."""
    n = len(jax.devices())
    if not (data_parallel or fsdp > 1 or tp > 1) or n == 1:
        return None
    if n % (fsdp * tp) != 0:
        raise ValueError(
            f"fsdp({fsdp}) x tp({tp}) must divide the device count ({n})")
    slices = {getattr(d, "slice_index", 0) or 0 for d in jax.devices()}
    if len(slices) > 1:  # multi-slice: dp over DCN, the rest inside slices
        per = n // len(slices)
        dp = per // (fsdp * tp) if data_parallel else 1
        return make_multislice_mesh(dp=dp, fsdp=fsdp, tp=tp)
    dp = n // (fsdp * tp) if data_parallel else 1
    if dp * fsdp * tp != n:
        raise ValueError(
            f"mesh {dp}x{fsdp}x{tp} does not cover {n} devices; enable "
            f"data_parallel or raise fsdp/tp")
    return make_mesh(dp=dp, fsdp=fsdp, tp=tp)
