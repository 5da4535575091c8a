"""Pallas TPU flash attention (non-causal) — forward AND backward kernels.

Forward: online-softmax over kv blocks, kv resident in VMEM, MXU-shaped
(BQ, D) x (D, BK) tiles; also emits the per-row logsumexp L for the
backward. Backward: the standard two-kernel flash scheme — one grid over
q-blocks producing dQ, one over kv-blocks producing dK/dV, each recomputing
P = exp(S - L) blockwise so nothing (T, T)-shaped ever exists in HBM.

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


def _pick_bk(s: int) -> int:
    for bk in (512, 256, 128):
        if s % bk == 0:
            return bk
    return 0


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, s_len, bk):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    D = q.shape[-1]
    n_kv = s_len // bk

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        vj = v_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mj = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - mj)
        corr = jnp.exp(m - mj)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return mj, l, acc

    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _pad_d(x, Dp):
    D = x.shape[-1]
    if D == Dp:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Dp - D)])


def _fwd(q, k, v, scale):
    B, H, T, D = q.shape
    S = k.shape[2]
    bk = _pick_bk(S)
    Dp = max(128, ((D + 127) // 128) * 128)
    qf = _pad_d(q, Dp).reshape(B * H, T, Dp)
    kf = _pad_d(k, Dp).reshape(B * H, S, Dp)
    vf = _pad_d(v, Dp).reshape(B * H, S, Dp)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, s_len=S, bk=bk),
        grid=(B * H, T // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * Dp,
            bytes_accessed=(B * H) * (2 * T * Dp + 2 * S * Dp) * 2,
            transcendentals=B * H * T * S,
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    out = out.reshape(B, H, T, Dp)[..., :D]
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref,
                   *, scale, s_len, bk):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (BQ, 1)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (BQ, 1)
    D = q.shape[-1]
    n_kv = s_len // bk

    def body(j, dq):
        kj = k_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        vj = v_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vj, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, kj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, n_kv, body, jnp.zeros((q.shape[0], D),
                                                    jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, *, scale, t_len, bk):
    k = k_ref[0].astype(jnp.float32)  # (bk, D)
    v = v_ref[0].astype(jnp.float32)
    D = k.shape[-1]
    n_q = t_len // BQ

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        doi = do_ref[0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        oi = o_ref[0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        lse_i = lse_ref[0, pl.ds(i * BQ, BQ), :]
        delta_i = jnp.sum(doi * oi, axis=-1, keepdims=True)
        s = jax.lax.dot_general(qi, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse_i)  # (BQ, bk)
        dv = dv + jax.lax.dot_general(p, doi, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doi, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_i)
        dk = dk + jax.lax.dot_general(ds, qi, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32
                                      ) * scale
        return dk, dv

    dk0 = jnp.zeros((k.shape[0], D), jnp.float32)
    dv0 = jnp.zeros((k.shape[0], D), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, res, g):
    q, k, v, out, lse = res
    B, H, T, D = q.shape
    S = k.shape[2]
    bk = _pick_bk(S)
    Dp = max(128, ((D + 127) // 128) * 128)
    qf = _pad_d(q, Dp).reshape(B * H, T, Dp)
    kf = _pad_d(k, Dp).reshape(B * H, S, Dp)
    vf = _pad_d(v, Dp).reshape(B * H, S, Dp)
    dof = _pad_d(g, Dp).reshape(B * H, T, Dp)
    of = _pad_d(out, Dp).reshape(B * H, T, Dp)

    full_T = lambda b, i: (b, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, s_len=S, bk=bk),
        grid=(B * H, T // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dp), full_T, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dp), full_T, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, dof, of, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, t_len=T, bk=bk),
        grid=(B * H, S // bk),
        in_specs=[
            pl.BlockSpec((1, bk, Dp), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, Dp), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, Dp), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, Dp), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, S, Dp), k.dtype),
            jax.ShapeDtypeStruct((B * H, S, Dp), v.dtype),
        ),
        interpret=_interpret(),
    )(kf, vf, qf, dof, of, lse)

    dq = dq.reshape(B, H, T, Dp)[..., :D]
    dk = dk.reshape(B, H, S, Dp)[..., :D]
    dv = dv.reshape(B, H, S, Dp)[..., :D]
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
