"""Optimizers over the trainable pytree: masked AdamW with per-group LRs.

Replaces the reference's param-group AdamW construction (dual unet/text LR
at train_lora_dreambooth.py:659-676; three groups incl. TI at
cli_lora_pti.py:997-1010) and the LR schedulers from diffusers.get_scheduler.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Union

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax


class _Quant8(NamedTuple):
    """Blockwise-int8 tensor: values in [-127, 127] with one f32 absmax
    scale per block of `_BLOCK` elements (flattened, zero-padded)."""
    q: jax.Array       # int8 (n_blocks, _BLOCK)
    scale: jax.Array   # f32  (n_blocks, 1)


_BLOCK = 256


def _quantize(x: jax.Array) -> _Quant8:
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % _BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    b = flat.reshape(-1, _BLOCK)
    s = jnp.max(jnp.abs(b), axis=1, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(b / s), -127, 127).astype(jnp.int8)
    return _Quant8(q, s)


def _dequantize(t: _Quant8, shape) -> jax.Array:
    flat = (t.q.astype(jnp.float32) * t.scale).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu: object   # pytree of _Quant8
    nu: object   # pytree of _Quant8


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with BOTH moments stored blockwise-int8 (absmax per 256-element
    block) — the TPU counterpart of bitsandbytes AdamW8bit
    (reference train_lora_dreambooth.py:641-651). Moments are dequantized
    to f32 for the update and requantized after, so state memory is ~2
    bytes/param (vs 8 f32); the linear absmax code differs from bnb's
    dynamic-quantile codebook but serves the same memory role."""

    def init(params):
        def z(p):
            return _quantize(jnp.zeros(p.shape, jnp.float32))
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mu_q, nu_q):
            g = g.astype(jnp.float32)
            mu = b1 * _dequantize(mu_q, g.shape) + (1.0 - b1) * g
            # nu is carried as its sqrt (RMS): linear-absmax int8 on raw nu
            # crushes small second moments to zero and explodes the step;
            # quantizing the denominator itself bounds the error instead
            rms_prev = _dequantize(nu_q, g.shape)
            nu = b2 * rms_prev * rms_prev + (1.0 - b2) * g * g
            rms = jnp.sqrt(nu)
            step = (mu / c1) / (rms / jnp.sqrt(c2) + eps)
            return step, _quantize(mu), _quantize(rms)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, ScaleByAdam8bitState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def adamw_8bit(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
               weight_decay=1e-2) -> optax.GradientTransformation:
    """AdamW with int8 moment state (see scale_by_adam_8bit)."""
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


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


def _fused_by_group(
    transforms: Dict[str, optax.GradientTransformation],
    max_grad_norm: Optional[float],
) -> optax.GradientTransformation:
    """Run each group's transformation on ONE raveled vector instead of
    per-leaf.

    A rank-4 LoRA over the UNet is ~200 tiny leaves; per-leaf Adam emits
    thousands of microscopic XLA ops whose fixed per-op cost dominates the
    actual arithmetic at bs=1 (profiled: >1500 sub-50us fusions per step).
    Raveling each group to a single flat vector turns the update into a few
    large fusions. Elementwise math is unchanged (Adam is elementwise and
    every group is dtype-homogeneous f32, so ravel/unravel is pure layout);
    the global-norm clip differs from optax.clip_by_global_norm only in
    summation order."""

    def init(params):
        state = {}
        for k, sub in params.items():
            flat, _ = jax.flatten_util.ravel_pytree(sub)
            state[k] = transforms[k].init(flat)
        return state

    def update(grads, state, params=None):
        flats = {}
        for k, sub in grads.items():
            flats[k] = jax.flatten_util.ravel_pytree(sub)
        if max_grad_norm is not None:
            gn = jnp.sqrt(sum(jnp.sum(jnp.square(f)) for f, _ in
                              flats.values()))
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gn, 1e-16))
        else:
            scale = None
        new_state, updates = {}, {}
        for k, (gflat, unravel) in flats.items():
            if scale is not None:
                gflat = gflat * scale
            pflat = (jax.flatten_util.ravel_pytree(params[k])[0]
                     if params is not None else None)
            u, new_state[k] = transforms[k].update(gflat, state[k], pflat)
            updates[k] = unravel(u)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    trainable: Dict,
    lrs: Dict[str, optax.Schedule | float],
    *,
    weight_decay: float = 1e-2,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    grad_accum: int = 1,
    low_memory: Union[bool, str] = False,
    fused: bool = True,
) -> optax.GradientTransformation:
    """lrs: {"lora_unet": lr, "lora_text": lr, "ti": lr} — groups absent from
    `trainable` are ignored. TI gets no weight decay (the reference uses its
    norm prior instead, cli_lora_pti.py:448-469). low_memory: "bf16" (or
    True) stores Adam's first moment in bf16; "int8" stores BOTH moments
    blockwise-int8 (adamw_8bit) — the counterparts of the reference's
    optional bitsandbytes AdamW8bit (train_lora_dreambooth.py:641-651).
    fused=True runs each group's update on one raveled vector (see
    _fused_by_group); fused=False keeps the per-leaf optax.multi_transform
    structure (equivalence is pinned by tests/test_training.py)."""

    def group(name):
        lr = lrs[name]
        wd = 0.0 if name == "ti" else weight_decay
        if low_memory == "int8":
            return adamw_8bit(learning_rate=lr, b1=betas[0], b2=betas[1],
                              eps=eps, weight_decay=wd)
        return optax.adamw(
            learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
            mu_dtype=jnp.bfloat16 if low_memory else None,
            weight_decay=wd)

    transforms = {k: group(k) for k in trainable.keys()}
    if fused:
        opt = _fused_by_group(transforms, max_grad_norm)
    else:
        tx = optax.multi_transform(transforms, _label_tree(trainable))
        chain = []
        if max_grad_norm is not None:
            chain.append(optax.clip_by_global_norm(max_grad_norm))
        chain.append(tx)
        opt = optax.chain(*chain)
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt
