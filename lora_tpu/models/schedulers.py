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
# PNDM (PLMS with skipped PRK warmup) — SD-1.x's default inference sampler
# ---------------------------------------------------------------------------

def pndm_timesteps(sched: NoiseSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending PLMS timestep list; the second-highest step is visited
    twice for the pseudo-improved-Euler warmup (skip_prk_steps behavior)."""
    ratio = sched.num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round().astype(np.int64)
    ts = ts + sched.steps_offset
    plms = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
    return plms.copy()


def pndm_init_state(latent_shape, dtype=jnp.float32):
    return {
        "ets": jnp.zeros((4,) + tuple(latent_shape), dtype),
        "n_ets": jnp.zeros((), jnp.int32),
        "counter": jnp.zeros((), jnp.int32),
        "cur_sample": jnp.zeros(latent_shape, dtype),
    }


def _pndm_prev_sample(sched, sample, t, prev_t, eps):
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(prev_t >= 0,
                       sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
                       sched.final_alpha_cumprod)
    b_t = 1.0 - a_t
    b_prev = 1.0 - a_prev
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
    return (sample_coeff * sample
            - (a_prev - a_t) * eps / denom).astype(sample.dtype)


def pndm_step(sched: NoiseSchedule, state: dict, model_out: jax.Array,
              t: jax.Array, sample: jax.Array, ratio: int):
    """One PLMS step. `t` comes from pndm_timesteps; all state is carried
    in fixed-shape arrays (jit/scan-safe)."""
    eps = model_out.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    counter = state["counter"]
    is_warm2 = counter == 1  # second visit of the duplicated timestep

    # push eps into the ets ring unless on the warmup-average call
    ets = jnp.where(is_warm2, state["ets"],
                    jnp.concatenate([eps[None], state["ets"][:-1]], 0))
    n_ets = jnp.where(is_warm2, state["n_ets"],
                      jnp.minimum(state["n_ets"] + 1, 4))

    e1, e2, e3, e4 = ets[0], ets[1], ets[2], ets[3]
    combos = jnp.stack([
        e1,                                               # 1 point
        (3 * e1 - e2) / 2,                                # 2 points
        (23 * e1 - 16 * e2 + 5 * e3) / 12,                # 3 points
        (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24,      # AB4
    ])
    eps_ms = combos[jnp.clip(n_ets, 1, 4) - 1]
    # warmup second call: average of fresh eps and the stored one, applied
    # from the saved sample at the original (higher) timestep
    eps_use = jnp.where(is_warm2, (eps + e1) / 2.0, eps_ms)
    x_use = jnp.where(is_warm2, state["cur_sample"], x)
    t_use = jnp.where(is_warm2, t + ratio, t)

    prev = _pndm_prev_sample(sched, x_use, t_use, t_use - ratio, eps_use)
    new_state = {
        "ets": ets,
        "n_ets": n_ets,
        "counter": counter + 1,
        "cur_sample": jnp.where(counter == 0, x, state["cur_sample"]),
    }
    return prev.astype(sample.dtype), new_state


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M, multistep, data prediction) — strong at low step counts
# ---------------------------------------------------------------------------

def dpmpp_timesteps(sched: NoiseSchedule, num_inference_steps: int) -> np.ndarray:
    return np.linspace(0, sched.num_train_timesteps - 1,
                       num_inference_steps + 1)[::-1][:-1].round().astype(
                           np.int64).copy()


def dpmpp_init_state(latent_shape, dtype=jnp.float32):
    return {
        "d_prev": jnp.zeros(latent_shape, dtype),
        "lambda_prev": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.int32),
    }


def _alpha_sigma_lambda(sched, t):
    a = jnp.where(t >= 0, sched.alphas_cumprod[jnp.maximum(t, 0)],
                  sched.final_alpha_cumprod)
    alpha = jnp.sqrt(a)
    sigma = jnp.sqrt(1.0 - a)
    lam = jnp.log(alpha) - jnp.log(jnp.maximum(sigma, 1e-10))
    return alpha, sigma, lam


def dpmpp_step(sched: NoiseSchedule, state: dict, model_out: jax.Array,
               t: jax.Array, sample: jax.Array, prev_t: jax.Array):
    """One DPM-Solver++(2M) step (epsilon-prediction model; first step is
    first-order, later steps use the 2M multistep combination)."""
    x = sample.astype(jnp.float32)
    eps = model_out.astype(jnp.float32)
    alpha_s, sigma_s, lam_s = _alpha_sigma_lambda(sched, t)
    alpha_t, sigma_t, lam_t = _alpha_sigma_lambda(sched, prev_t)
    # data (x0) prediction
    d = (x - sigma_s * eps) / alpha_s
    h = lam_t - lam_s
    h_prev = lam_s - state["lambda_prev"]
    r = h_prev / jnp.where(h == 0, 1.0, h)
    d_multi = jnp.where(
        state["count"] > 0,
        (1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-8))) * d
        - (1.0 / (2.0 * jnp.maximum(r, 1e-8))) * state["d_prev"],
        d,
    )
    x_next = (sigma_t / sigma_s) * x - alpha_t * (jnp.exp(-h) - 1.0) * d_multi
    new_state = {"d_prev": d, "lambda_prev": lam_s,
                 "count": state["count"] + 1}
    return x_next.astype(sample.dtype), new_state


# ---------------------------------------------------------------------------
# Euler discrete (k-diffusion style)
# ---------------------------------------------------------------------------

def euler_sigmas(sched: NoiseSchedule, num_inference_steps: int) -> np.ndarray:
    """(S+1,) descending sigmas incl. terminal 0; linspace-interpolated over
    the training sigmas."""
    a = np.asarray(sched.alphas_cumprod, np.float64)
    sig_all = ((1 - a) / a) ** 0.5
    ts = np.linspace(0, sched.num_train_timesteps - 1, num_inference_steps,
                     dtype=np.float64)[::-1]
    sig = np.interp(ts, np.arange(len(sig_all)), sig_all)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def euler_timesteps(sched: NoiseSchedule, num_inference_steps: int) -> np.ndarray:
    return np.linspace(0, sched.num_train_timesteps - 1, num_inference_steps
                       )[::-1].round().astype(np.int64).copy()


def karras_sigmas(sched: NoiseSchedule, num_inference_steps: int,
                  rho: float = 7.0) -> Tuple[np.ndarray, np.ndarray]:
    """Karras et al. (2022) sigma spacing for the euler sampler. Returns
    (sigmas (S+1,), matching integer timesteps (S,)) — timesteps are the
    nearest training steps for the model's conditioning input."""
    a = np.asarray(sched.alphas_cumprod, np.float64)
    sig_all = ((1 - a) / a) ** 0.5
    sig_min, sig_max = sig_all[0], sig_all[-1]
    ramp = np.linspace(0, 1, num_inference_steps)
    inv_rho = 1.0 / rho
    sig = (sig_max**inv_rho + ramp * (sig_min**inv_rho - sig_max**inv_rho)
           ) ** rho
    ts = np.interp(sig, sig_all, np.arange(len(sig_all))).round().astype(
        np.int64)
    return (np.concatenate([sig, [0.0]]).astype(np.float32), ts)


def euler_scale_model_input(sample: jax.Array, sigma) -> jax.Array:
    return (sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype))


def euler_step(sample: jax.Array, eps: jax.Array, sigma, sigma_next) -> jax.Array:
    """Deterministic Euler step in sigma space (epsilon prediction)."""
    x = sample.astype(jnp.float32)
    denoised = x - sigma * eps.astype(jnp.float32)
    d = (x - denoised) / sigma
    return (x + d * (sigma_next - sigma)).astype(sample.dtype)


def euler_ancestral_step(sample: jax.Array, eps: jax.Array, sigma,
                         sigma_next, noise: jax.Array) -> jax.Array:
    """Stochastic (ancestral) Euler step in sigma space."""
    x = sample.astype(jnp.float32)
    sigma_up = jnp.sqrt(jnp.maximum(
        sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2,
                                                                 1e-20), 0.0))
    sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
    denoised = x - sigma * eps.astype(jnp.float32)
    d = (x - denoised) / sigma
    x = x + d * (sigma_down - sigma)
    return (x + noise.astype(jnp.float32) * sigma_up).astype(sample.dtype)


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
