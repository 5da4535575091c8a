"""Primitive layers over flat parameter dicts.

Params are a flat {dotted_name: array} dict in torch weight layout
(Linear (out,in), Conv (out,in,kh,kw)) so HF checkpoint import is an
identity key mapping and LoRA serialization stays byte-compatible.
Activations are NHWC (TPU-preferred); XLA re-lays out OIHW kernels at
compile time.

Every dense/conv consults an optional LoRA context:

    lora = {"sites": {name: {"up", "down"[, "diag"]}}, "scale": scalar,
            "dropout_p": float, "rng": PRNGKey | None}

matching the reference's injected-module forward
(LoraInjectedLinear/Conv2d, lora.py:53-58,130-135).
"""

from __future__ import annotations

import zlib
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.lora import lora_delta_conv, lora_delta_dense

Params = Dict[str, jax.Array]

_QUANT_SCALE_SUFFIX = "_scale"  # core/quantize.py companion-key convention


def _lora_entry(lora, name):
    if lora is None:
        return None
    return lora["sites"].get(name)


def _lora_rng(lora, name):
    rng = lora.get("rng") if lora else None
    if rng is None:
        return None, 0.0
    return (
        jax.random.fold_in(rng, zlib.crc32(name.encode()) & 0x7FFFFFFF),
        lora.get("dropout_p", 0.0),
    )


def _weight(p: Params, key: str, dtype) -> jax.Array:
    w = p[key]
    if w.dtype == jnp.int8:  # quantized base (core/quantize.py)
        from ..core.quantize import dequantize_weight

        return dequantize_weight(p, key, dtype)
    return w.astype(dtype)


def dense(p: Params, name: str, x: jax.Array, lora=None) -> jax.Array:
    wq = p[name + ".weight"]
    if wq.dtype == jnp.int8 and wq.ndim == 2:
        from ..ops import int8_matmul as i8

        if i8.supported(x, wq):
            # Pallas kernel: int8 tiles stream from HBM, dequant in VMEM —
            # weight bandwidth stays halved (ops/int8_matmul.py)
            y = i8.int8_matmul(x, wq, p[name + ".weight" +
                                        _QUANT_SCALE_SUFFIX])
        else:
            y = x @ _weight(p, name + ".weight", x.dtype).T
    else:
        y = x @ _weight(p, name + ".weight", x.dtype).T
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    entry = _lora_entry(lora, name)
    if entry is not None:
        rng, drop = _lora_rng(lora, name)
        y = y + lora_delta_dense(x, entry, lora["scale"], rng, drop,
                                 idx=lora.get("idx"))
    return y


def conv2d(
    p: Params,
    name: str,
    x: jax.Array,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    lora=None,
) -> jax.Array:
    w = _weight(p, name + ".weight", x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    entry = _lora_entry(lora, name)
    if entry is not None:
        rng, drop = _lora_rng(lora, name)
        y = y + lora_delta_conv(x, entry, lora["scale"], stride, padding,
                                rng, drop, idx=lora.get("idx"))
    return y


def group_norm(p: Params, name: str, x: jax.Array, groups: int,
               eps: float) -> jax.Array:
    """GroupNorm over NHWC channels; statistics in f32.

    Layout note (v5e-profiled): reducing a (B, H, W, G, C/G) view puts
    C/G — 10/20/40 in the SD UNet, 4 in the VAE — in the minor (lane)
    dimension, so every vector op on the reshaped array wastes most of the
    128 lanes and the stats passes ran ~17x over roofline at batch 8.
    Instead reduce spatially per-CHANNEL first (native NHWC layout, C
    minor, lane-dense), then combine channels into groups on a tiny (B, C)
    array where layout is irrelevant. One-pass E[x]/E[x^2] moments: a
    data-dependent shift would make the stats depend on x before the
    reduction, breaking XLA's fusion of s1/s2 into the producing conv's
    epilogue (measured: a shifted variant cost ~14% of the training
    headline). The cancellation hazard of E[x^2]-E[x]^2 is bounded here:
    f32 gives var error ~ mean^2 * 2^-23, and GN inputs in the SD UNet/VAE
    are conv outputs with |mean| <= O(10^2), so the absolute var error
    <= ~1e-3 — negligible against the per-group variances (O(1)+) these
    layers see, with the clamp guarding the var < 0 corner. layer_norm
    (below) IS two-pass: its input is already resident, so the robust form
    is free there."""
    dt = x.dtype
    B, H, W, C = x.shape
    cg = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, C)
    s1 = jnp.sum(xf, axis=1)       # (B, C) — spatial partials, lane-dense
    s2 = jnp.sum(xf * xf, axis=1)  # shares the single read of x with s1
    n = float(H * W * cg)
    mean = s1.reshape(B, groups, cg).sum(-1) / n          # (B, G)
    m2 = s2.reshape(B, groups, cg).sum(-1) / n
    var = jnp.maximum(m2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # per-group scalars back to per-channel (tiny), applied in one
    # elementwise pass over the native layout
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]     # (B, 1, C)
    inv_c = jnp.repeat(inv, cg, axis=1)[:, None, :]
    w = p[name + ".weight"].astype(jnp.float32)
    b = p[name + ".bias"].astype(jnp.float32)
    out = (xf - mean_c) * (inv_c * w) + b
    return out.reshape(B, H, W, C).astype(dt)


def layer_norm(p: Params, name: str, x: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    # one-pass E[x]/E[x^2] moments, same rationale as group_norm above: the
    # two-pass form needs the mean before the second reduction, which broke
    # the stats' fusion into the producer and cost ~3% of the training
    # headline (three quiet-machine runs: 24.3-24.7 vs 25.5 steps/s).
    # Cancellation needs var << mean^2 (near-constant rows) — transformer
    # residual activations are not that, and the clamp guards the corner.
    mean = xf.mean(-1, keepdims=True)
    m2 = (xf * xf).mean(-1, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p[name + ".weight"].astype(jnp.float32) + p[name + ".bias"].astype(
        jnp.float32
    )
    return out.astype(dt)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def timestep_embedding(
    timesteps: jax.Array, dim: int, *, flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0, max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, matching diffusers get_timestep_embedding
    semantics (SD1.5: flip_sin_to_cos=True, freq_shift=0 -> [cos | sin])."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
