"""Pallas TPU int8-weight matmul: y = x @ dequant(Wq)^T.

The serving path stores frozen base weights int8 with per-out-channel scales
(core/quantize.py). XLA's dequantize-then-matmul materializes the bf16 weight
in HBM/VMEM per use; this kernel streams the INT8 tiles from HBM and casts
inside VMEM, so weight bandwidth stays halved end-to-end — the point of
quantizing a memory-bound serving workload. Accumulation is f32 on the MXU;
the per-channel scale is applied once to the accumulator, not the weight.

Used by models/layers.dense for 2-D int8 weights on TPU; everything else
falls back to the XLA dequant path (models/layers._weight).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256
BN = 256


def _ceil_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.bfloat16)          # (BM, K)
    w = w_ref[...].astype(jnp.bfloat16)          # (BN, K) int8 -> bf16 in VMEM
    # precision pinned: a global jax_default_matmul_precision="highest"
    # (multi-pass bf16 emulation) is not lowerable by Mosaic here
    acc = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def int8_matmul(x: jax.Array, wq: jax.Array, scale: jax.Array) -> jax.Array:
    """x (..., K) float; wq (N, K) int8; scale (N,) f32 -> (..., N) x.dtype."""
    *lead, K = x.shape
    N = wq.shape[0]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    Mp, Np, Kp = _ceil_to(max(M, 8), BM), _ceil_to(N, BN), _ceil_to(K, 128)
    if (Mp, Kp) != (M, K):
        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    if (Np, Kp) != (N, K):
        wq = jnp.pad(wq, ((0, Np - N), (0, Kp - K)))
    s2 = jnp.pad(scale.astype(jnp.float32), (0, Np - N)).reshape(1, Np)

    out = pl.pallas_call(
        _kernel,
        grid=(Mp // BM, Np // BN),
        in_specs=[
            pl.BlockSpec((BM, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, Kp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Np * Kp + Mp * Np * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x2, wq, s2)
    return out[:M, :N].reshape(*lead, N)


def supported(x: jax.Array, wq: jax.Array) -> bool:
    """Opt-in only (LORA_TPU_INT8_KERNEL=1). Measured on v5e: the SD UNet
    has ~100 small dense sites, and per-call kernel overhead makes this path
    ~1.5x slower than XLA's fused dequant there (PERF.md round 2). It wins
    only for large single matmuls; int8 remains primarily an HBM-capacity
    lever either way."""
    import os

    if os.environ.get("LORA_TPU_INT8_KERNEL") != "1":
        return False
    if wq.ndim != 2:
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return m >= 128 and jax.default_backend() in ("tpu", "axon")
