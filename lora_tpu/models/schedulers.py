"""Diffusion noise schedules — DDPM (training) and DDIM/PNDM (sampling).

Replaces the reference's diffusers scheduler usage:
  - DDPMScheduler.add_noise in the train loss (cli_lora_pti.py:306)
  - get_velocity for v-prediction targets (cli_lora_pti.py:336)
  - pipeline samplers for inference (patch_pipe demo path, SURVEY §3.3)

SD-1.5 schedule: scaled_linear betas, beta_start=0.00085, beta_end=0.012,
1000 train steps. All functions are jit-safe (gather by traced timestep).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    num_train_timesteps: int
    alphas_cumprod: jax.Array  # (T,) f32
    final_alpha_cumprod: float
    steps_offset: int = 1
    prediction_type: str = "epsilon"


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    set_alpha_to_one: bool = False,
    steps_offset: int = 1,
    prediction_type: str = "epsilon",
) -> NoiseSchedule:
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=np.float64) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    return NoiseSchedule(
        num_train_timesteps=num_train_timesteps,
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        final_alpha_cumprod=final,
        steps_offset=steps_offset,
        prediction_type=prediction_type,
    )


def _gather(sched: NoiseSchedule, t: jax.Array, like: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """sqrt(abar_t), sqrt(1-abar_t) broadcast to `like`'s rank."""
    a = sched.alphas_cumprod[t]
    shape = (-1,) + (1,) * (like.ndim - 1)
    sa = jnp.sqrt(a).reshape(shape).astype(like.dtype)
    sb = jnp.sqrt(1.0 - a).reshape(shape).astype(like.dtype)
    return sa, sb


def add_noise(sched: NoiseSchedule, sample: jax.Array, noise: jax.Array,
              t: jax.Array) -> jax.Array:
    sa, sb = _gather(sched, t, sample)
    return sa * sample + sb * noise


def get_velocity(sched: NoiseSchedule, sample: jax.Array, noise: jax.Array,
                 t: jax.Array) -> jax.Array:
    sa, sb = _gather(sched, t, sample)
    return sa * noise - sb * sample


def pred_to_x0_eps(sched: NoiseSchedule, model_out: jax.Array,
                   sample: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Convert a model prediction into (x0, eps) per prediction_type."""
    sa, sb = _gather(sched, t, sample)
    if sched.prediction_type == "epsilon":
        eps = model_out
        x0 = (sample - sb * eps) / sa
    elif sched.prediction_type == "v_prediction":
        x0 = sa * sample - sb * model_out
        eps = sa * model_out + sb * sample
    else:  # "sample"
        x0 = model_out
        eps = (sample - sa * x0) / sb
    return x0, eps


# ---------------------------------------------------------------------------
# DDIM sampler
# ---------------------------------------------------------------------------

def ddim_timesteps(sched: NoiseSchedule, num_inference_steps: int) -> np.ndarray:
    ratio = sched.num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
    return ts + sched.steps_offset


def ddim_step(
    sched: NoiseSchedule,
    model_out: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    prev_t: jax.Array,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    x0, eps = pred_to_x0_eps(sched, model_out.astype(jnp.float32),
                             sample.astype(jnp.float32), t)
    a_prev = jnp.where(
        prev_t >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    )
    a_t = sched.alphas_cumprod[t]
    if eta > 0.0:
        var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
    else:
        sigma = 0.0
    shape = (-1,) + (1,) * (sample.ndim - 1)
    a_prev = a_prev.reshape(shape) if jnp.ndim(a_prev) else a_prev
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
    prev = jnp.sqrt(a_prev) * x0 + dir_xt
    if eta > 0.0 and noise is not None:
        prev = prev + sigma * noise
    return prev.astype(sample.dtype)


# ---------------------------------------------------------------------------
# DDPM ancestral sampler (training-schedule sampling / eval)
# ---------------------------------------------------------------------------

def ddpm_step(
    sched: NoiseSchedule,
    model_out: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    x0, eps = pred_to_x0_eps(sched, model_out.astype(jnp.float32),
                             sample.astype(jnp.float32), t)
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t > 0, sched.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = 1.0 - a_t / a_prev
    # posterior mean coefficients (DDPM eq. 7)
    coef_x0 = jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)
    coef_xt = jnp.sqrt(a_t / a_prev) * (1.0 - a_prev) / (1.0 - a_t)
    mean = coef_x0 * x0 + coef_xt * sample
    var = jnp.clip(beta_t * (1.0 - a_prev) / (1.0 - a_t), 1e-20)
    sigma = jnp.where(t > 0, jnp.sqrt(var), 0.0)
    return (mean + sigma * noise).astype(sample.dtype)
