"""Headline benchmark: DreamBooth-LoRA rank-4 training steps/sec/chip on the
real SD-1.5 UNet + CLIP text encoder (bf16, 512px latents, batch 1/chip,
cached latents — the run_lora_db_unet_only.sh configuration).

Baseline: the rebuild target is 800 steps in <2 min on a v5e-8
(BASELINE.json), i.e. 6.67 steps/s on 8 chips = 0.833 steps/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N,
   "mfu_pct": ...}

`python bench.py --full` additionally measures batch scaling (bs 4/8) and
the uncached path (VAE encode inside the jitted step) — several extra XLA
compiles, so it is not the default. Timing and FLOP counting share one
compiled executable (AOT via .lower().compile()), so MFU reflects exactly
the program being timed.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_STEPS_PER_SEC_PER_CHIP = 800.0 / 120.0 / 8.0  # 0.833
PEAK_BF16_FLOPS = 197e12  # TPU v5e (v5 lite) per chip

METRIC_NAME = "dreambooth_lora_rank4_train_steps_per_sec_per_chip"

import bench_common


def _emit_unavailable(err: str):
    bench_common.emit_unavailable(METRIC_NAME, err,
                                  unit="steps/sec/chip", vs_baseline=None)


if __name__ == "__main__":
    # probe BEFORE any in-process backend touch; a bare import of this
    # module (tests, smokes) must not probe or exit
    _probe_err = bench_common.probe_backend()
    if _probe_err is not None:
        _emit_unavailable(_probe_err)
        sys.exit(0)

import jax
import jax.numpy as jnp

from lora_tpu.utils import compile_cache

# persistent compile cache: repeat bench runs skip the big XLA compiles
compile_cache.enable("/root/repo/.jax_cache")


def _bench_config(batch_size, cached, models, n_steps=30, windows=3):
    """Compile ONE executable for this config; return (steps/sec, mfu%)."""
    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import unet_lora_sites
    from lora_tpu.models.clip import clip_text_forward
    from lora_tpu.models.config import SD15_TEXT, SD15_UNET, SD15_VAE
    from lora_tpu.training.loss import LossConfig
    from lora_tpu.training.optim import make_optimizer
    from lora_tpu.training.train_step import make_train_step

    dtype = jnp.bfloat16
    unet_p, text_p, vae_p, sched, k3 = models
    trainable = {"lora_unet": init_lora(unet_lora_sites(SD15_UNET), r=4,
                                        rng=k3)}
    opt = make_optimizer(trainable, {"lora_unet": 1e-4})
    step = make_train_step(
        unet_cfg=SD15_UNET, text_cfg=SD15_TEXT, vae_cfg=SD15_VAE,
        sched=sched, loss_cfg=LossConfig(cached_latents=cached),
        optimizer=opt, dtype=dtype)

    # unet-only training: fixed prompts -> text embeddings precomputed once
    # (the trainers' cache_text_embeddings fast path)
    ids = jax.random.randint(jax.random.PRNGKey(6), (batch_size, 77), 0, 49000)
    enc = jax.jit(lambda p, i: clip_text_forward(
        p, i, SD15_TEXT, dtype=dtype))(text_p, ids)
    batch = {"encoder_hidden_states": enc}
    if cached:
        batch["latents"] = jax.random.normal(
            jax.random.PRNGKey(5), (batch_size, 64, 64, 4), dtype)
    else:
        batch["pixel_values"] = jax.random.normal(
            jax.random.PRNGKey(5), (batch_size, 512, 512, 3), dtype)
    base = (unet_p, text_p, vae_p if not cached else {})
    opt_state = opt.init(trainable)
    rng0 = jax.random.PRNGKey(7)

    compiled = step.lower(trainable, opt_state, base, batch, rng0).compile()
    mem = _memory_analysis(compiled)
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # warmup on the same executable
    trainable, opt_state, loss = compiled(trainable, opt_state, base, batch,
                                          rng0)
    jax.block_until_ready(loss)

    # best-of windows: the shared tunnel adds run-to-run interference;
    # best-of measures the hardware, not the neighbors. Windows implying
    # >60% MFU are relay hiccups (observed once: a window reporting 275%
    # MFU, physically impossible — the step runs ~21%) and are discarded.
    def plausible(s):
        return flops is None or (s * flops / PEAK_BF16_FLOPS) < 0.60

    sps = 0.0
    for w in range(windows + 2):  # up to 2 retries replace discarded windows
        if w >= windows and sps > 0.0:
            break
        t0 = time.perf_counter()
        for i in range(n_steps):
            trainable, opt_state, loss = compiled(
                trainable, opt_state, base, batch,
                jax.random.fold_in(jax.random.PRNGKey(8), w * n_steps + i))
        jax.block_until_ready(loss)
        s = n_steps / (time.perf_counter() - t0)
        if plausible(s):
            sps = max(sps, s)
    mfu = round(100.0 * sps * flops / PEAK_BF16_FLOPS, 1) if flops else None
    try:  # peak device memory over the run (reference claim: >12 GB GPU)
        ms = jax.local_devices()[0].memory_stats() or {}
        peak_gb = round(ms.get("peak_bytes_in_use", 0) / 2**30, 2) or None
    except Exception:
        peak_gb = None
    if peak_gb is None and mem:
        # runtime stats are unavailable through the tunnel; fall back to the
        # compile-time estimate from XLA's memory analysis (labeled as such
        # via hbm_source so the two are never conflated)
        peak_gb = mem.get("total_gb")
    return sps, mfu, flops, peak_gb, mem


def _memory_analysis(compiled):
    """Compile-time HBM estimate from the AOT executable — works without
    runtime memory_stats (which the tunnel does not forward)."""
    try:
        ma = compiled.memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        g = lambda name: getattr(ma, name, 0) or 0
        arg = g("argument_size_in_bytes")
        out = g("output_size_in_bytes")
        alias = g("alias_size_in_bytes")
        tmp = g("temp_size_in_bytes")
        code = g("generated_code_size_in_bytes")
        total = arg + out - alias + tmp + code
        gb = lambda b: round(b / 2**30, 3)
        return {"source": "xla_memory_analysis_compile_time",
                "argument_gb": gb(arg), "output_gb": gb(out),
                "alias_gb": gb(alias), "temp_gb": gb(tmp),
                "code_gb": gb(code), "total_gb": gb(total)}
    except Exception:
        return {}


def _make_models(need_vae: bool):
    from lora_tpu.models import schedulers
    from lora_tpu.models.clip import init_clip_text
    from lora_tpu.models.config import SD15_TEXT, SD15_UNET, SD15_VAE
    from lora_tpu.models.unet import init_unet
    from lora_tpu.models.vae import init_vae

    dtype = jnp.bfloat16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    return (init_unet(SD15_UNET, k1, dtype=dtype),
            init_clip_text(SD15_TEXT, k2, dtype=dtype),
            init_vae(SD15_VAE, k4, dtype=dtype) if need_vae else {},
            schedulers.make_schedule(), k3)


def one(spec: str):
    """Measure a single config: `--one <bs>:<cached|uncached>` (used to split
    the full matrix across processes; each big graph compiles in its own
    process within the tunnel's time budget)."""
    bs, kind = spec.split(":")
    cached = kind == "cached"
    models = _make_models(need_vae=not cached)
    s, m, fl, peak, mem = _bench_config(int(bs), cached=cached, models=models,
                                        n_steps=15, windows=2)
    print(json.dumps({"config": spec, "steps_per_sec": round(s, 3),
                      "images_per_sec": round(s * int(bs), 2),
                      "mfu_pct": m, "flops_per_step": fl,
                      "peak_hbm_gb": peak, "memory_analysis": mem}))


def mem_table():
    """`--mem`: compile-time HBM table (no timed runs) — train bs 1/8 plus
    the 50-step CFG sampling loop, against the reference's ">12 GB GPU for
    PTI" claim (reference README.md:137). AOT-compile only; uses the
    persistent cache, so warm runs are fast."""
    from lora_tpu.models.config import SD15_UNET
    from lora_tpu.pipelines.sd import _denoise_loop

    models = _make_models(need_vae=False)
    rows = {}
    for bs in (1, 8):
        _, _, _, _, mem = _bench_config(bs, cached=True, models=models,
                                        n_steps=0, windows=0)
        rows[f"train_cached_bs{bs}"] = mem
    try:
        unet_p, _, _, sched, _ = models
        steps = 50
        ts = jnp.arange(999, -1, -1000 // steps, jnp.int32)
        emb = jnp.zeros((1, 77, 768), jnp.bfloat16)
        compiled = _denoise_loop.lower(
            unet_p, None, jnp.zeros((1, 64, 64, 4), jnp.bfloat16),
            emb, emb, jnp.float32(7.5), ts, sched.alphas_cumprod,
            jnp.float32(sched.final_alpha_cumprod), unet_cfg=SD15_UNET,
            num_inference_steps=steps, use_cfg=True,
            method="ddim").compile()
        rows["sample_50step_cfg_512"] = _memory_analysis(compiled)
    except Exception as e:  # sampling-loop lowering is best-effort here
        rows["sample_50step_cfg_512"] = {"error": str(e)[-200:]}

    # SDXL train step at 1024px (128x128 latents), rank-8 LoRA, cached
    # latents + cached dual-encoder conditioning — with and without remat.
    # Compile-time only; shows whether full-size XL training fits a 16 GB
    # v5e chip before anyone burns hardware time finding out.
    try:
        from lora_tpu.core.lora import init_lora
        from lora_tpu.core.sites import unet_lora_sites
        from lora_tpu.models.clip import init_clip_text
        from lora_tpu.models.config import (
            SDXL_TEXT,
            SDXL_TEXT2,
            SDXL_UNET,
            SDXL_VAE,
        )
        from lora_tpu.models.unet import init_unet
        from lora_tpu.training.loss import LossConfig
        from lora_tpu.training.optim import make_optimizer
        from lora_tpu.training.train_step import make_train_step

        dtype = jnp.bfloat16
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
        unet_p = init_unet(SDXL_UNET, k1, dtype=dtype)
        text_p = init_clip_text(SDXL_TEXT, k2, dtype=dtype)
        text2_p = init_clip_text(SDXL_TEXT2, k3, dtype=dtype)
        trainable = {"lora_unet": init_lora(unet_lora_sites(SDXL_UNET),
                                            r=8, rng=k4)}
        opt = make_optimizer(trainable, {"lora_unet": 1e-4})
        sched = models[3]
        batch = {
            "latents": jnp.zeros((1, 128, 128, 4), dtype),
            "encoder_hidden_states": jnp.zeros(
                (1, 77, SDXL_UNET.cross_attention_dim), dtype),
            "add_text_embeds": jnp.zeros(
                (1, SDXL_TEXT2.projection_dim), dtype),
            "add_time_ids": jnp.zeros((1, 6), jnp.float32),
        }
        for remat in (False, True):
            step = make_train_step(
                unet_cfg=SDXL_UNET, text_cfg=SDXL_TEXT, vae_cfg=SDXL_VAE,
                sched=sched,
                loss_cfg=LossConfig(cached_latents=True,
                                    gradient_checkpointing=remat),
                optimizer=opt, dtype=dtype, text2_cfg=SDXL_TEXT2,
                eos_id=49407)
            compiled = step.lower(
                trainable, opt.init(trainable),
                (unet_p, text_p, text2_p, {}), batch,
                jax.random.PRNGKey(7)).compile()
            tag = "xl_train_cached_bs1_1024" + ("_remat" if remat else "")
            rows[tag] = _memory_analysis(compiled)
    except Exception as e:
        rows["xl_train_cached_bs1_1024"] = {"error": str(e)[-200:]}
    print(json.dumps({"metric": "compiled_hbm_estimate",
                      "unit": "GB", "rows": rows}))


def main(full: bool = False):
    models = _make_models(need_vae=full)

    sps, mfu, flops, peak, mem = _bench_config(1, cached=True, models=models)
    out = {
        "metric": METRIC_NAME,
        "value": round(sps, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 4),
        "mfu_pct": mfu,
        "flops_per_step": flops,
        "peak_hbm_gb": peak,
        "memory_analysis": mem,
    }

    if full:
        scaling = {}
        for bs in (4, 8):
            s, m, _, _, _ = _bench_config(bs, cached=True, models=models,
                                          n_steps=15, windows=2)
            scaling[str(bs)] = {"steps_per_sec": round(s, 3),
                                "images_per_sec": round(s * bs, 2),
                                "mfu_pct": m}
        out["batch_scaling_cached"] = scaling
        unc = {}
        for bs in (1, 4):
            s, m, _, _, _ = _bench_config(bs, cached=False, models=models,
                                          n_steps=15, windows=2)
            unc[str(bs)] = {"steps_per_sec": round(s, 3),
                            "images_per_sec": round(s * bs, 2),
                            "mfu_pct": m}
        out["uncached_vae_in_loop"] = unc

    print(json.dumps(out))


if __name__ == "__main__":
    try:
        if "--one" in sys.argv[1:]:
            one(sys.argv[sys.argv.index("--one") + 1])
        elif "--mem" in sys.argv[1:]:
            mem_table()
        else:
            main(full="--full" in sys.argv[1:])
    except Exception as e:
        # a backend that passed the probe but died mid-run still produces a
        # parseable record rather than a bare traceback
        if "UNAVAILABLE" in str(e) or "backend" in str(e).lower():
            _emit_unavailable(str(e))
            sys.exit(0)
        raise
