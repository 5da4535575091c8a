"""The diffusion training loss as a jitted pure function.

Reference: loss_step (cli_lora_pti.py:260-370). Differences forced by JAX:
explicit PRNG threading (the reference uses torch's implicit RNG), and the
trainable leaves (LoRA trees + TI buffer) are function inputs so jax.grad
differentiates only them — the frozen base never sees gradient traffic.

Trainable pytree:
    trainable = {"lora_unet": LoraTree|None,
                 "lora_text": LoraTree|None,
                 "ti": {"embeds": (K, D)}|None}
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models import schedulers
from ..models.clip import clip_text_forward
from ..models.config import CLIPTextConfig, UNetConfig, VAEConfig
from ..models.unet import unet_forward
from ..models.vae import vae_encode


@dataclasses.dataclass(frozen=True)
class LossConfig:
    t_multiplier: float = 1.0
    mask_temperature: float = 1.0
    cached_latents: bool = True
    train_inpainting: bool = False
    with_prior_preservation: bool = False
    prior_loss_weight: float = 1.0
    lora_dropout_p: float = 0.0
    gradient_checkpointing: bool = False


def _resize_mask_nearest(mask: jax.Array, h: int, w: int) -> jax.Array:
    """(B, H, W, 1) -> (B, h, w, 1) nearest (matches F.interpolate nearest)."""
    B, H, W, _ = mask.shape
    ys = (jnp.arange(h) * (H / h)).astype(jnp.int32)
    xs = (jnp.arange(w) * (W / w)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]


def ids2_from_ids(ids, eos_id: int):
    """Derive SDXL tokenizer_2 ids from tokenizer_1 ids: both tokenizers
    share the BPE vocab; the only difference is padding (te1 pads with EOS,
    te2 pads with id 0 — pipelines/sdxl.py module docstring). BPE cannot
    emit EOS mid-text, so every position strictly AFTER the first EOS is
    padding: zero it. Works for numpy and jax arrays."""
    np_mod = jnp if isinstance(ids, jax.Array) else __import__("numpy")
    is_eos = (ids == eos_id).astype(np_mod.int32)
    after = np_mod.cumsum(is_eos, axis=-1) - is_eos
    return np_mod.where(after > 0, 0, ids)


def loss_step(
    trainable: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    unet_params,
    text_params,
    vae_params,
    unet_cfg: UNetConfig,
    text_cfg: CLIPTextConfig,
    vae_cfg: VAEConfig,
    sched: schedulers.NoiseSchedule,
    cfg: LossConfig,
    ti_ids: Optional[jax.Array] = None,
    dtype=jnp.float32,
    # SDXL (unet_cfg.addition_embed_type == "text_time"): the second text
    # encoder and the tokenizer EOS id (for deriving te2 ids + pooling)
    text2_params=None,
    text2_cfg: Optional[CLIPTextConfig] = None,
    eos_id: Optional[int] = None,
) -> jax.Array:
    k_vae, k_noise, k_t, k_drop, k_mvae = jax.random.split(rng, 5)

    if cfg.cached_latents:
        latents = batch["latents"].astype(dtype)
    else:
        latents = vae_encode(vae_params, batch["pixel_values"].astype(dtype),
                             vae_cfg, k_vae)

    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    bsz = latents.shape[0]
    t_hi = int(sched.num_train_timesteps * cfg.t_multiplier)
    timesteps = jax.random.randint(k_t, (bsz,), 0, t_hi)

    noisy = schedulers.add_noise(sched, latents, noise, timesteps)

    if cfg.train_inpainting:
        if cfg.cached_latents:
            masked_latents = batch["masked_image_latents"].astype(dtype)
            mask_small = batch["mask_values"].astype(dtype)
        else:
            masked_latents = vae_encode(
                vae_params, batch["masked_image_values"].astype(dtype),
                vae_cfg, k_mvae)
            mask_small = _resize_mask_nearest(
                batch["mask_values"].astype(dtype),
                latents.shape[1], latents.shape[2])
        model_input = jnp.concatenate([noisy, mask_small, masked_latents],
                                      axis=-1)
    else:
        model_input = noisy

    lora_text = trainable.get("lora_text")
    ti = trainable.get("ti")
    xl = unet_cfg.addition_embed_type == "text_time"
    pooled = None
    if "encoder_hidden_states" in batch:
        # precomputed text embeddings (valid only when neither text LoRA nor
        # TI trains — the trainer guards this); removes CLIP from the hot
        # loop just like VAE latent caching removes the VAE. For SDXL the
        # cache also carries te2's projected pooled EOS embedding.
        encoder_hidden = batch["encoder_hidden_states"].astype(dtype)
        if xl:
            pooled = batch["add_text_embeds"].astype(dtype)
    elif xl:
        # dual-encoder SDXL conditioning (pipelines/sdxl._jit_dual_encode):
        # both encoders at the penultimate layer, features concatenated;
        # te2 additionally yields the pooled projected EOS embedding
        if ti is not None:
            raise ValueError("textual inversion is not supported for SDXL "
                             "training (dual-tokenizer TI is out of scope)")
        ids = batch["input_ids"]
        ids2 = batch.get("input_ids_2")
        if ids2 is None:
            ids2 = ids2_from_ids(ids, eos_id)
        h1 = clip_text_forward(text_params, ids, text_cfg, lora=lora_text,
                               dtype=dtype, penultimate=True)
        h2, pooled = clip_text_forward(
            text2_params, ids2, text2_cfg,
            lora=trainable.get("lora_text2"), dtype=dtype,
            penultimate=True, pooled_eos_id=eos_id)
        encoder_hidden = jnp.concatenate([h1, h2.astype(h1.dtype)], -1)
    else:
        encoder_hidden = clip_text_forward(
            text_params, batch["input_ids"], text_cfg, lora=lora_text,
            ti_embeds=ti["embeds"] if ti is not None else None,
            ti_ids=ti_ids, dtype=dtype)

    lora_unet = trainable.get("lora_unet")
    if lora_unet is not None and cfg.lora_dropout_p > 0.0:
        lora_unet = {**lora_unet, "rng": k_drop,
                     "dropout_p": cfg.lora_dropout_p}
    added_cond = None
    if xl:
        added_cond = {"text_embeds": pooled.astype(dtype),
                      "time_ids": batch["add_time_ids"].astype(dtype)}
    model_pred = unet_forward(unet_params, model_input, timesteps,
                              encoder_hidden, unet_cfg, lora=lora_unet,
                              remat=cfg.gradient_checkpointing,
                              added_cond=added_cond)

    if sched.prediction_type == "epsilon":
        target = noise
    elif sched.prediction_type == "v_prediction":
        target = schedulers.get_velocity(sched, latents, noise, timesteps)
    else:
        raise ValueError(f"Unknown prediction type {sched.prediction_type}")

    if "mask" in batch and batch["mask"] is not None:
        # pixel-space mask -> latent res, temperature-sharpened, peak-normed
        # (cli_lora_pti.py:341-362)
        mask = batch["mask"].astype(jnp.float32)
        mask = _resize_mask_nearest(mask, model_pred.shape[1],
                                    model_pred.shape[2])
        mask = (mask + 0.01) ** cfg.mask_temperature
        mask = mask / mask.max()
        model_pred = model_pred * mask.astype(model_pred.dtype)
        target = target * mask.astype(target.dtype)

    se = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_example = se.mean(axis=(1, 2, 3))

    if cfg.with_prior_preservation:
        return prior_preserving_reduce(
            per_example, batch.get("is_instance"), cfg.prior_loss_weight)
    return per_example.mean()


def prior_preserving_reduce(per_example: jax.Array,
                            is_instance: Optional[jax.Array],
                            prior_loss_weight: float) -> jax.Array:
    """instance.mean() + w * class.mean() (train_lora_dreambooth.py:843-875).

    The row layout is carried explicitly as `is_instance` (1.0 for instance
    rows, 0.0 for class rows) because under multi-process the global batch is
    assembled from per-process row blocks — [p0_inst, p0_class, p1_inst,
    p1_class] — so a positional midpoint split would silently average class
    rows into the instance term. Falls back to the midpoint split (valid for
    the single-process [instance | class] collate) only when no mask is
    given."""
    if is_instance is not None:
        m = is_instance.astype(jnp.float32)
        inst = (per_example * m).sum() / m.sum()
        prior = (per_example * (1.0 - m)).sum() / (1.0 - m).sum()
    else:
        half = per_example.shape[0] // 2
        inst = per_example[:half].mean()
        prior = per_example[half:].mean()
    return inst + prior_loss_weight * prior
