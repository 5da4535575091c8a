"""SVD distillation: extract a rank-r LoRA from a full fine-tune
(reference cli_svd.py). Runs on-device with jnp.linalg.svd; per-site
residual W_tuned - W_base is factorized (conv kernels flattened to 2-D),
truncated to rank r, and clamped to +-quantile(|[U;Vh]|, q)
(cli_svd.py:28-92)."""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from .lora import LoraTree
from .sites import Site


def svd_distill_site(w_base: jax.Array, w_tuned: jax.Array, rank: int,
                     clamp_quantile: float = 0.99):
    """-> (up, down) in torch layout, float32."""
    shape = w_base.shape
    diff = (w_tuned.astype(jnp.float32) - w_base.astype(jnp.float32))
    d2 = diff.reshape(shape[0], -1)
    U, S, Vh = jnp.linalg.svd(d2, full_matrices=False)
    U = U[:, :rank]
    S = S[:rank]
    Vh = Vh[:rank, :]
    U = U * S[None, :]
    dist = jnp.concatenate([U.flatten(), Vh.flatten()])
    hi = jnp.quantile(jnp.abs(dist), clamp_quantile)
    U = jnp.clip(U, -hi, hi)
    Vh = jnp.clip(Vh, -hi, hi)
    if len(shape) == 4:  # conv: up is 1x1, down carries the kernel
        up = U.reshape(shape[0], rank, 1, 1)
        down = Vh.reshape(rank, shape[1], shape[2], shape[3])
    else:
        up = U
        down = Vh
    return up, down


def svd_distill(base_params: Dict[str, jax.Array],
                tuned_params: Dict[str, jax.Array],
                sites: Sequence[Site], rank: int = 4,
                clamp_quantile: float = 0.99) -> LoraTree:
    site_tree = {}
    for s in sites:
        key = s.name + ".weight"
        up, down = svd_distill_site(base_params[key], tuned_params[key],
                                    rank, clamp_quantile)
        site_tree[s.name] = {"up": up, "down": down}
    return {"sites": site_tree, "scale": jnp.asarray(1.0, jnp.float32)}
