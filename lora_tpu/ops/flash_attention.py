"""Pallas TPU flash attention (non-causal) — forward AND backward kernels.

Forward: online-softmax over kv blocks, kv resident in VMEM, MXU-shaped
(BQ, D) x (D, BK) tiles; also emits the per-row logsumexp L for the
backward. Backward: the standard two-kernel flash scheme — one grid over
q-blocks producing dQ, one over kv-blocks producing dK/dV, each recomputing
P = exp(S - L) blockwise so nothing (T, T)-shaped ever exists in HBM.

Layout/precision decisions (all measured on v5e, see PERF.md):
- Blocks keep the true head dim D (40/80/160 in the SD UNet); Mosaic pads
  the VMEM tiles internally, so no padded copies of q/k/v ever hit HBM.
- Dots run in the input dtype (bf16 in training — native single-pass MXU)
  and accumulate in f32 via preferred_element_type; f32 inputs keep
  HIGHEST so f32 references/tests stay exact.
- `scale` is folded into q once outside the kernels (and peeled back off
  dQ in the VJP wrapper), removing a (BQ, BK)-sized multiply per block
  from every kernel.

Used for the UNet's spatial self-attention (T up to 4096 at 512px);
ops/attention.py routes eligible shapes here and everything else to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256   # q rows per program
NEG_INF = -1e30

# VMEM caps for the score/prob tiles (see _kv_chunk), sized for 2-byte
# (bf16) inputs — _cap quarters them for f32 inputs. At SD sizes these make
# the fwd kernel single-pass (full-row softmax) and the bwd kernels 2-4
# large dots per block instead of 8-16 small ones.
FWD_KV_CAP = 4096
DQ_KV_CAP = 2048
DKV_Q_CAP = 1024


def _cap(cap: int, dtype) -> int:
    """Quarter the chunk cap for 4-byte inputs (both the input blocks and
    the in-kernel cast copies grow) so the tiles stay inside the 16 MB
    scoped-VMEM budget regardless of dtype."""
    return cap // 4 if jnp.dtype(dtype).itemsize >= 4 else cap


def _prec(dt):
    """Per-dtype dot precision: bf16 inputs run native single-pass MXU
    (DEFAULT — also the only mode Mosaic lowers reliably); f32 inputs keep
    true-f32 contractions (HIGHEST) so f32 references/tests stay exact.
    All dots accumulate in f32 via preferred_element_type regardless."""
    return (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _pick_bk(s: int) -> int:
    for bk in (512, 256, 128):
        if s % bk == 0:
            return bk
    return 0


def _kv_chunk(s: int, cap: int) -> int:
    """Largest kv-chunk (multiple of the base block, capped so the f32
    score/probability tiles stay comfortably inside VMEM). Bigger chunks =
    fewer, larger dots = less online-softmax correction work and better
    MXU/VPU overlap; at SD sizes (S <= 4096) the fwd kernel degenerates to
    a single-pass row-resident softmax, which is faster than the blockwise
    scheme — the flash structure is kept only for S beyond the VMEM cap."""
    bk = _pick_bk(s)
    if bk > cap:
        # the base block itself can exceed a quartered f32 cap (e.g.
        # DKV_Q_CAP//4 = 256 while _pick_bk returns 512); drop to the
        # largest divisor block that fits so the promised VMEM bound holds
        # (any bk from _pick_bk is a multiple of 128, so one of these fits)
        for b in (256, 128):
            if b <= cap and s % b == 0:
                bk = b
                break
    c = bk
    while c * 2 <= min(s, cap) and s % (c * 2) == 0:
        c *= 2
    return c


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _scale_q(q, scale):
    """Fold the softmax scale into q (one rounding, same magnitude as the
    bf16 dot's own input rounding)."""
    return (q.astype(jnp.float32) * scale).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, s_len, bk):
    q = q_ref[0]  # (BQ, D), pre-scaled, input dtype: bf16 dots run native MXU
    dt = q.dtype
    prec = _prec(dt)
    D = q.shape[-1]
    n_kv = s_len // bk

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * bk, bk), :]
        vj = v_ref[0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        mj = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - mj)
        corr = jnp.exp(m - mj)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(dt), vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        return mj, l, acc

    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _fwd(q, k, v, scale):
    B, H, T, D = q.shape
    S = k.shape[2]
    bk = _kv_chunk(S, _cap(FWD_KV_CAP, q.dtype))
    qf = _scale_q(q, scale).reshape(B * H, T, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, s_len=S, bk=bk),
        grid=(B * H, T // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(B * H) * (2 * T * D + 2 * S * D) * 2,
            transcendentals=B * H * T * S,
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out.reshape(B, H, T, D), lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref,
                   *, s_len, bk):
    q = q_ref[0]  # pre-scaled; input dtype for the dots, f32 accumulation
    do = do_ref[0]
    dt = q.dtype
    prec = _prec(dt)
    lse = stats_ref[0][:, 0:1]    # (BQ, 1)
    delta = stats_ref[0][:, 1:2]  # (BQ, 1) — sum(do*o) precomputed in XLA
    D = q.shape[-1]
    n_kv = s_len // bk

    def body(j, dq):
        kj = k_ref[0, pl.ds(j * bk, bk), :]
        vj = v_ref[0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vj, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(dt), kj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    # caller multiplies by `scale` (dL/dq = scale * ds @ k for pre-scaled q)
    dq = jax.lax.fori_loop(0, n_kv, body, jnp.zeros((q.shape[0], D),
                                                    jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, stats_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc):
    """Streaming dK/dV: grid (B*H, S/bk, T/bq), q/do/stats arrive as
    bq-blocks (the last grid dim iterates over them — Pallas pipelines the
    DMAs), dk/dv accumulate in f32 VMEM scratch and are written once on
    the final q-block. No full-T block ever sits in VMEM, so the kernel
    fits the scoped budget in f32 as well as bf16."""
    i = pl.program_id(2)
    n_q = pl.num_programs(2)
    k = k_ref[0]  # (grid_bk, D), input dtype for the dots
    v = v_ref[0]
    dt = k.dtype
    prec = _prec(dt)

    @pl.when(i == 0)
    def _zero():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    qi = q_ref[0]    # (bq, D), pre-scaled
    doi = do_ref[0]  # (bq, D)
    st = stats_ref[0]
    lse_i = st[:, 0:1]
    delta_i = st[:, 1:2]
    s = jax.lax.dot_general(qi, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    p = jnp.exp(s - lse_i)  # (bq, grid_bk)
    dv_acc[...] += jax.lax.dot_general(p.astype(dt), doi,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=prec)
    dp = jax.lax.dot_general(doi, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    ds = p * (dp - delta_i)
    # ds^T @ (scale*q) IS dk for pre-scaled q — no extra multiply needed
    dk_acc[...] += jax.lax.dot_general(ds.astype(dt), qi,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=prec)

    @pl.when(i == n_q - 1)
    def _write():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd(scale, res, g):
    q, k, v, out, lse = res
    B, H, T, D = q.shape
    S = k.shape[2]
    grid_bk = _pick_bk(S)            # kv rows per dkv program
    dq_bk = _kv_chunk(S, _cap(DQ_KV_CAP, q.dtype))  # dq-loop kv chunk
    # T % BQ == 0 is the `supported()` precondition, so a q-block size
    # always exists; fail loudly if a caller bypassed the guard
    if _pick_bk(T) == 0:
        raise ValueError(f"flash_attention backward needs T % {BQ} == 0, "
                         f"got T={T} (see `supported`)")
    dkv_bq = _kv_chunk(T, _cap(DKV_Q_CAP, q.dtype))
    qf = _scale_q(q, scale).reshape(B * H, T, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)
    dof = g.reshape(B * H, T, D)
    # delta = sum(do * o) per row, computed once in XLA (fused, one pass)
    # and shipped together with lse as a single (B*H, T, 2) stats array —
    # this keeps the full-T `o` block out of both backward kernels, which
    # is what lets the f32 path fit in scoped VMEM
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True).reshape(B * H, T, 1)
    stats = jnp.concatenate([lse, delta], axis=-1)  # (B*H, T, 2) f32

    full_T = lambda b, i: (b, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, s_len=S, bk=dq_bk),
        grid=(B * H, T // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full_T, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full_T, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, dof, stats)

    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(B * H, S // grid_bk, T // dkv_bq),
        in_specs=[
            pl.BlockSpec((1, grid_bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grid_bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_bq, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_bq, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dkv_bq, 2), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, grid_bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grid_bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, S, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, S, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((grid_bk, D), jnp.float32),
            pltpu.VMEM((grid_bk, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(kf, vf, qf, dof, stats)

    dq = (dq.astype(jnp.float32) * scale).astype(q.dtype).reshape(B, H, T, D)
    dk = dk.reshape(B, H, S, D)
    dv = dv.reshape(B, H, S, D)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """(B, H, T, D) non-causal attention. T % 256 == 0, S in {128,256,512}
    multiples (caller guards via `supported`)."""
    out, _ = _fwd(q, k, v, scale)
    return out


def _vjp_fwd(q, k, v, scale):
    out, lse = _fwd(q, k, v, scale)
    return out, (q, k, v, out, lse)


flash_attention.defvjp(_vjp_fwd, _bwd)


def supported(q_shape, k_shape) -> bool:
    T = q_shape[2]
    S = k_shape[2]
    return T % BQ == 0 and _pick_bk(S) > 0
