"""Optimizers over the trainable pytree: masked AdamW with per-group LRs.

Replaces the reference's param-group AdamW construction (dual unet/text LR
at train_lora_dreambooth.py:659-676; three groups incl. TI at
cli_lora_pti.py:997-1010) and the LR schedulers from diffusers.get_scheduler.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import optax


def _label_tree(trainable: Dict) -> Dict:
    """Label every leaf by its top-level group name."""
    return {
        k: jax.tree_util.tree_map(lambda _: k, v)
        for k, v in trainable.items()
    }


def make_lr_schedule(
    name: str, lr: float, total_steps: int, warmup_steps: int = 0
) -> optax.Schedule:
    """constant / linear / cosine (+ optional warmup) — the subset of
    diffusers get_scheduler the recipes use."""
    if name == "constant":
        base = optax.constant_schedule(lr)
    elif name == "linear":
        base = optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))
    elif name == "cosine":
        base = optax.cosine_decay_schedule(lr, max(total_steps - warmup_steps, 1))
    else:
        raise ValueError(f"unknown lr schedule {name}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.join_schedules([warm, base], [warmup_steps])
    return base


def make_optimizer(
    trainable: Dict,
    lrs: Dict[str, optax.Schedule | float],
    *,
    weight_decay: float = 1e-2,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    grad_accum: int = 1,
    low_memory: bool = False,
) -> optax.GradientTransformation:
    """lrs: {"lora_unet": lr, "lora_text": lr, "ti": lr} — groups absent from
    `trainable` are ignored. TI gets no weight decay (the reference uses its
    norm prior instead, cli_lora_pti.py:448-469). low_memory stores Adam's
    first moment in bf16 — the TPU stand-in for the reference's optional
    bitsandbytes AdamW8bit (train_lora_dreambooth.py:641-651)."""
    import jax.numpy as jnp

    def group(name):
        lr = lrs[name]
        return optax.adamw(
            learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
            mu_dtype=jnp.bfloat16 if low_memory else None,
            weight_decay=0.0 if name == "ti" else weight_decay)

    transforms = {k: group(k) for k in trainable.keys()}
    tx = optax.multi_transform(transforms, _label_tree(trainable))
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    opt = optax.chain(*chain)
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt
