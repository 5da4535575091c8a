"""Scaled dot-product attention.

`attention()` is the single entry point used by all models. On TPU it
dispatches to the Pallas flash kernel (ops/flash_attention.py) when shapes
qualify; otherwise (CPU tests, tiny/ragged shapes) it falls back to the XLA
einsum path with an f32 softmax.

Layout: (B, H, T, D) throughout.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale: float, causal_mask: Optional[jax.Array]):
    dt = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal_mask is not None:
        logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


_FLASH_ENABLED = True


def set_use_memory_efficient_attention(enabled: bool) -> None:
    """Global toggle for the Pallas flash-attention path — the counterpart
    of the reference's xformers switch (xformers_utils.py:42-70; here
    support is shape-based via flash_attention.supported, no probe kernels
    needed)."""
    global _FLASH_ENABLED
    _FLASH_ENABLED = enabled


def _use_flash(q, k) -> bool:
    if not _FLASH_ENABLED or os.environ.get("LORA_TPU_DISABLE_FLASH"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from .flash_attention import supported

    return supported(q.shape, k.shape)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
) -> jax.Array:
    """(B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if causal:
        Tq, Tk = q.shape[-2], k.shape[-2]
        mask = jnp.tril(jnp.ones((Tq, Tk), bool), k=Tk - Tq)[None, None]
    else:
        mask = None
    if mask is None and _use_flash(q, k):
        try:
            from .flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception:
            pass  # fall through to XLA (e.g. unsupported shape)
    return _xla_attention(q, k, v, scale, mask)
