"""Headline benchmark: DreamBooth-LoRA rank-4 training steps/sec/chip on the
real SD-1.5 UNet + CLIP text encoder (bf16, 512px latents, batch 1/chip,
cached latents — the run_lora_db_unet_only.sh configuration).

Baseline: the rebuild target is 800 steps in <2 min on a v5e-8
(BASELINE.json), i.e. 6.67 steps/s on 8 chips = 0.833 steps/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N}
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC_PER_CHIP = 800.0 / 120.0 / 8.0  # 0.833


def main():
    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import unet_lora_sites
    from lora_tpu.models import schedulers
    from lora_tpu.models.clip import init_clip_text
    from lora_tpu.models.config import SD15_TEXT, SD15_UNET, SD15_VAE
    from lora_tpu.models.unet import init_unet
    from lora_tpu.training.loss import LossConfig
    from lora_tpu.training.optim import make_optimizer
    from lora_tpu.training.train_step import make_train_step

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    unet_p = init_unet(SD15_UNET, k1, dtype=dtype)
    text_p = init_clip_text(SD15_TEXT, k2, dtype=dtype)
    vae_p = {}  # cached latents: VAE out of the hot loop (cli_lora_pti.py:141-151)

    trainable = {
        "lora_unet": init_lora(unet_lora_sites(SD15_UNET), r=4, rng=k3),
    }
    opt = make_optimizer(trainable, {"lora_unet": 1e-4})
    sched = schedulers.make_schedule()
    step = make_train_step(
        unet_cfg=SD15_UNET, text_cfg=SD15_TEXT, vae_cfg=SD15_VAE, sched=sched,
        loss_cfg=LossConfig(cached_latents=True), optimizer=opt, dtype=dtype)

    B = 1  # per-chip batch of the reference recipe
    # unet-only training: prompts are fixed -> text embeddings precomputed
    # once (trainers do the same via cache_text_embeddings)
    from lora_tpu.models.clip import clip_text_forward

    ids = jax.random.randint(jax.random.PRNGKey(6), (B, 77), 0, 49000)
    enc = jax.jit(lambda p, i: clip_text_forward(p, i, SD15_TEXT,
                                                 dtype=dtype))(text_p, ids)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(5), (B, 64, 64, 4),
                                     dtype),
        "encoder_hidden_states": enc,
    }
    opt_state = opt.init(trainable)

    # warmup / compile
    trainable, opt_state, loss = step(trainable, opt_state,
                                      (unet_p, text_p, vae_p), batch,
                                      jax.random.PRNGKey(7))
    jax.block_until_ready(loss)

    # best of 3 windows: the shared-tunnel environment adds run-to-run
    # interference; best-of measures the hardware, not the neighbors
    n_steps = 30
    sps = 0.0
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            trainable, opt_state, loss = step(trainable, opt_state,
                                              (unet_p, text_p, vae_p), batch,
                                              jax.random.fold_in(
                                                  jax.random.PRNGKey(8),
                                                  w * n_steps + i))
        jax.block_until_ready(loss)
        sps = max(sps, n_steps / (time.perf_counter() - t0))

    print(json.dumps({
        "metric": "dreambooth_lora_rank4_train_steps_per_sec_per_chip",
        "value": round(sps, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
