"""Jitted (optionally mesh-sharded) train step factory.

One compiled function per training run: value_and_grad over the trainable
pytree only (frozen base params flow in as constants-by-argument), optax
update, applied. Under a Mesh, the batch is dp-sharded and XLA psums the
LoRA/TI grads — the whole of DDP in one sharding annotation
(vs accelerate/NCCL in the reference, train_lora_dreambooth.py:877-888).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models import schedulers
from ..parallel import mesh as mesh_lib
from .loss import LossConfig, loss_step


def make_train_step(
    *,
    unet_cfg,
    text_cfg,
    vae_cfg,
    sched: schedulers.NoiseSchedule,
    loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation,
    ti_ids=None,
    dtype=jnp.float32,
    mesh=None,
    text2_cfg=None,
    eos_id=None,
) -> Callable:
    """Returns step(trainable, opt_state, base, batch, rng) ->
    (trainable, opt_state, loss) where base = (unet_p, text_p, vae_p), or
    (unet_p, text_p, text2_p, vae_p) when text2_cfg is given (SDXL)."""

    def loss_fn(trainable, base, batch, rng):
        if text2_cfg is not None:
            unet_p, text_p, text2_p, vae_p = base
        else:
            unet_p, text_p, vae_p = base
            text2_p = None
        return loss_step(
            trainable, batch, rng,
            unet_params=unet_p, text_params=text_p, vae_params=vae_p,
            unet_cfg=unet_cfg, text_cfg=text_cfg, vae_cfg=vae_cfg,
            sched=sched, cfg=loss_cfg, ti_ids=ti_ids, dtype=dtype,
            text2_params=text2_p, text2_cfg=text2_cfg, eos_id=eos_id)

    def step(trainable, opt_state, base, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, base, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        step,
        donate_argnums=(0, 1),
        in_shardings=(repl, repl, None, bsh, repl),
        out_shardings=(repl, repl, repl),
    )


def ti_norm_prior(ti_embeds: jax.Array, lr: float,
                  target_norm: float = 0.4) -> jax.Array:
    """The TI norm decay applied after each optimizer step during inversion
    (cli_lora_pti.py:448-469): renormalize each row toward `target_norm`
    with strength lambda = min(1, 100*lr)."""
    lam = min(1.0, 100.0 * lr)
    pre = jnp.linalg.norm(ti_embeds.astype(jnp.float32), axis=-1,
                          keepdims=True)
    unit = ti_embeds.astype(jnp.float32) / jnp.maximum(pre, 1e-12)
    out = unit * (pre + lam * (target_norm - pre))
    return out.astype(ti_embeds.dtype)
