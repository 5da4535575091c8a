"""Pallas TPU flash attention (non-causal, full kv per block-row).

Used for the UNet's spatial self-attention (T up to 4096 at 512px) where the
XLA path would materialize (T, T) logits in HBM. Online-softmax over kv
blocks keeps memory O(BQ * D) in VMEM and feeds the MXU with (BQ, D) x
(D, BK) tiles.

Backward: recomputes attention via the XLA einsum path under jax.custom_vjp
(memory equals XLA only during the backward of training steps; inference
and all forward passes stay flash). A fused flash backward kernel is the
planned follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256   # q rows per program
BK = 512   # kv rows per inner step

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_len: int,
                  bk: int):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    D = q.shape[-1]
    n_kv = s_len // bk

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)  # (bk, D)
        vj = v_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (BQ, BK)
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


def _pick_bk(s: int) -> int:
    for bk in (512, 256, 128):
        if s % bk == 0:
            return bk
    return 0


def _flash_fwd(q, k, v, scale):
    B, H, T, D = q.shape
    S = k.shape[2]
    bk = _pick_bk(S)
    Dp = max(128, ((D + 127) // 128) * 128)
    if Dp != D:
        pad = [(0, 0), (0, 0), (0, 0), (0, Dp - D)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    qf = q.reshape(B * H, T, Dp)
    kf = k.reshape(B * H, S, Dp)
    vf = v.reshape(B * H, S, Dp)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, s_len=S, bk=bk),
        grid=(B * H, T // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * Dp,
            bytes_accessed=(B * H) * (T * Dp + 2 * S * Dp + T * Dp) * 2,
            transcendentals=B * H * T * S,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(qf, kf, vf)
    out = out.reshape(B, H, T, Dp)
    return out[..., :D] if Dp != D else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """(B, H, T, D) non-causal attention. T % 256 == 0, S % 512 == 0
    (caller guards; ops.attention falls back to XLA otherwise)."""
    return _flash_fwd(q, k, v, scale)


def _vjp_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, res, g):
    q, k, v = res

    def ref_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    return vjp(g)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def supported(q_shape, k_shape) -> bool:
    T = q_shape[2]
    S = k_shape[2]
    return T % BQ == 0 and _pick_bk(S) > 0
