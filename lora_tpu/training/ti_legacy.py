"""Legacy single-loop TI+LoRA trainer
(reference training_scripts/train_lora_w_ti.py and its older caption variant
train_lora_pt_caption.py).

One optimizer over three groups with per-step LR switching
(train_lora_w_ti.py:986-994): before `unfreeze_lora_step` only the TI
embedding trains; after it, only the LoRA groups train. In optax this is a
step-dependent schedule per group — no param-group mutation needed. The
frozen-row restoration (:1070-1075) is structural here (only the TI buffer
is a grad leaf).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lora as lora_core
from ..core.save import save_all
from ..core.sites import text_encoder_lora_sites, unet_lora_sites
from ..data.dataset import DreamBoothTiDataset, data_loader
from ..pipelines.sd import StableDiffusionPipeline
from ..utils.metrics import MetricsLogger
from .loss import LossConfig
from .optim import make_optimizer
from .pti import setup_ti
from .train_step import make_train_step


@dataclasses.dataclass
class LegacyTiConfig:
    instance_data_dir: str = ""
    output_dir: str = "./output"
    placeholder_token: str = "<s>"
    initializer_token: Optional[str] = None
    learnable_property: str = "object"
    stochastic_attribute: Optional[str] = None
    with_prior_preservation: bool = False
    class_data_dir: Optional[str] = None
    class_prompt: Optional[str] = None
    prior_loss_weight: float = 1.0
    resolution: int = 512
    train_batch_size: int = 1
    learning_rate: float = 1e-4
    learning_rate_text: float = 5e-5
    learning_rate_ti: float = 5e-4
    train_text_encoder: bool = False
    lora_rank: int = 4
    max_train_steps: int = 3000
    unfreeze_lora_step: int = 1500
    save_steps: int = 500
    max_grad_norm: float = 1.0
    seed: int = 42
    color_jitter: bool = False
    h_flip: bool = True
    mixed_precision: Optional[str] = None
    output_format: str = "both"


def train_ti_lora_legacy(pipe: StableDiffusionPipeline,
                         cfg: LegacyTiConfig) -> dict:
    os.makedirs(cfg.output_dir, exist_ok=True)
    dtype = jnp.bfloat16 if cfg.mixed_precision == "bf16" else jnp.float32
    # only process 0 writes artifacts/metrics to the (shared) output dir
    from ..parallel.mesh import is_main_process

    main = is_main_process()
    log = MetricsLogger(os.path.join(cfg.output_dir, "metrics.jsonl")
                        if main else None, echo=main)
    rng = jax.random.PRNGKey(cfg.seed)

    rng, k_ti = jax.random.split(rng)
    init_tok = cfg.initializer_token or "<rand-0.017>"
    ti_ids, ti_init = setup_ti(pipe, [cfg.placeholder_token], [init_tok],
                               k_ti)

    usites = unet_lora_sites(pipe.unet_cfg)
    tsites = text_encoder_lora_sites(pipe.text_cfg)
    rng, k_u, k_t = jax.random.split(rng, 3)
    trainable = {
        "lora_unet": lora_core.init_lora(usites, r=cfg.lora_rank, rng=k_u),
        "ti": {"embeds": ti_init},
    }
    if cfg.train_text_encoder:
        trainable["lora_text"] = lora_core.init_lora(tsites, r=cfg.lora_rank,
                                                     rng=k_t)

    # per-step LR switching as schedules (the legacy param-group juggling)
    def gated(lr, active_before):
        def sched(step):
            before = step < cfg.unfreeze_lora_step
            on = before if active_before else jnp.logical_not(before)
            return jnp.where(on, lr, 0.0)
        return sched

    lrs = {"lora_unet": gated(cfg.learning_rate, False),
           "ti": gated(cfg.learning_rate_ti, True)}
    if cfg.train_text_encoder:
        lrs["lora_text"] = gated(cfg.learning_rate_text, False)
    opt = make_optimizer(trainable, lrs, max_grad_norm=cfg.max_grad_norm)

    ds = DreamBoothTiDataset(
        cfg.instance_data_dir, "", pipe.tokenizer,
        class_data_root=cfg.class_data_dir if cfg.with_prior_preservation
        else None,
        class_prompt=cfg.class_prompt, size=cfg.resolution,
        color_jitter=cfg.color_jitter, h_flip=cfg.h_flip, seed=cfg.seed,
        placeholder_token=cfg.placeholder_token,
        learnable_property=cfg.learnable_property,
        stochastic_attribute=cfg.stochastic_attribute)
    loader = data_loader(ds, cfg.train_batch_size, seed=cfg.seed,
                         prior_preservation=cfg.with_prior_preservation)

    step_fn = make_train_step(
        unet_cfg=pipe.unet_cfg, text_cfg=pipe.text_cfg, vae_cfg=pipe.vae_cfg,
        sched=pipe.schedule,
        loss_cfg=LossConfig(
            cached_latents=False,
            with_prior_preservation=cfg.with_prior_preservation,
            prior_loss_weight=cfg.prior_loss_weight),
        optimizer=opt, ti_ids=ti_ids, dtype=dtype)

    base = (pipe.unet_params, pipe.text_params, pipe.vae_params)
    opt_state = opt.init(trainable)

    def embeds_dict(tr):
        return {cfg.placeholder_token: np.asarray(tr["ti"]["embeds"][0],
                                                  np.float32)}

    def save(tr, name):
        if not main:
            return
        if cfg.output_format in ("safe", "both"):
            save_all(os.path.join(cfg.output_dir, name + ".safetensors"),
                     lora_unet=tr["lora_unet"], unet_sites=usites,
                     lora_text=tr.get("lora_text"), text_sites=tsites,
                     embeds=embeds_dict(tr))
        if cfg.output_format in ("pt", "both"):
            save_all(os.path.join(cfg.output_dir, name + ".pt"),
                     lora_unet=tr["lora_unet"], unet_sites=usites,
                     lora_text=tr.get("lora_text"), text_sites=tsites,
                     embeds=embeds_dict(tr), safe_form=False)

    t0 = time.perf_counter()
    loss = jnp.float32(0)
    from .checkpoint import PreemptionGuard

    loss = jnp.float32(float("nan"))
    preempted = False
    from ..parallel.mesh import PreemptionCoordinator

    stop_coord = PreemptionCoordinator()  # multihost-consistent stop
    with PreemptionGuard() as guard:
        for step in range(cfg.max_train_steps):
            if stop_coord.should_stop(guard.should_stop, step):
                # SIGTERM: save current adapters/embeds and stop cleanly
                save(trainable, f"lora_ti_preempt_{step}")
                preempted = True
                print(f"Preempted at step {step}; artifacts saved")
                break
            batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
            rng, k = jax.random.split(rng)
            trainable, opt_state, loss = step_fn(trainable, opt_state, base,
                                                 batch, k)
            if (step + 1) % 20 == 0 or step == 0:
                log.log(step=step + 1, loss=float(loss),
                        phase="ti" if step < cfg.unfreeze_lora_step
                        else "lora")
            if cfg.save_steps and (step + 1) % cfg.save_steps == 0:
                save(trainable, f"lora_ti_s{step + 1}")

    if not preempted:
        save(trainable, "lora_ti_final")
    return {"trainable": trainable, "final_loss": float(loss),
            "preempted": preempted,
            "seconds": time.perf_counter() - t0}
