"""DreamBooth-LoRA trainer (reference train_lora_dreambooth.py:486-1003),
TPU-native: jitted train step, optional data-parallel mesh over ICI, prior
preservation with on-the-fly class-image generation, dual unet/text LR,
resume from .pt, periodic + final saves in pt/safe formats.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lora as lora_core
from ..core.save import save_all
from ..core.sites import text_encoder_lora_sites, unet_lora_sites
from ..data.dataset import DreamBoothDataset, data_loader
from ..formats import pt_io
from ..parallel import mesh as mesh_lib
from ..pipelines.sd import StableDiffusionPipeline
from ..utils.metrics import MetricsLogger
from .loss import LossConfig
from .optim import make_lr_schedule, make_optimizer
from .train_step import make_train_step


@dataclasses.dataclass
class DreamBoothConfig:
    instance_data_dir: str = ""
    output_dir: str = "./output"
    instance_prompt: str = ""
    with_prior_preservation: bool = False
    class_data_dir: Optional[str] = None
    class_prompt: Optional[str] = None
    num_class_images: int = 100
    prior_loss_weight: float = 1.0
    resolution: int = 512
    train_batch_size: int = 1
    learning_rate: float = 1e-4
    learning_rate_text: float = 5e-5
    train_text_encoder: bool = False
    lora_rank: int = 4
    max_train_steps: int = 800
    save_steps: int = 500
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = False
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    max_grad_norm: float = 1.0
    adam_weight_decay: float = 1e-2
    use_8bit_adam: bool = False  # -> blockwise-int8 Adam moments (optim.adamw_8bit)
    dataloader_num_workers: int = 0  # thread-pool sample decode (0 = serial)
    seed: int = 0
    color_jitter: bool = False
    h_flip: bool = False
    resume_unet: Optional[str] = None
    resume_text_encoder: Optional[str] = None
    resume_state: Optional[str] = None  # full train-state checkpoint
    save_train_state: bool = False
    output_format: str = "both"  # pt | safe | both
    # which modules carry LoRA: "default" (attention+GEGLU, the reference
    # DreamBooth set), "extended" (+ResnetBlock2D convs), or "locon" (the
    # kohya full-conv superset incl. resampler convs + CLIP MLP; saves in
    # the kohya schema since the indexed format can't express those sites)
    lora_targets: str = "default"
    mixed_precision: Optional[str] = None  # None | "bf16"
    cached_latents: bool = False
    cache_text_embeddings: bool = True  # auto-disabled when text trains
    # mesh axes: dp consumes the devices left after fsdp*tp. Batch semantics
    # are per-chip (the accelerate convention, train_lora_dreambooth.py:
    # 632-638): global batch = train_batch_size x dp.
    data_parallel: bool = False
    # multihost: how often (micro-steps) ranks agree on the preemption stop
    # decision (parallel.mesh.PreemptionCoordinator); higher = less host
    # sync, slower detection
    preemption_sync_every: int = 10
    fsdp: int = 1            # shard frozen base weights (HBM savings)
    tensor_parallel: int = 1  # shard attention/FFN matmuls
    scale_lr: bool = False   # lr *= ga * per-chip batch * dp
    sample_guidance_scale: float = 7.5
    sample_steps: int = 50


def generate_class_images(pipe: StableDiffusionPipeline,
                          cfg: DreamBoothConfig) -> None:
    """Prior-preservation class image generation
    (train_lora_dreambooth.py:512-558)."""
    os.makedirs(cfg.class_data_dir, exist_ok=True)
    cur = len([f for f in os.listdir(cfg.class_data_dir)
               if f.lower().endswith((".jpg", ".png", ".jpeg"))])
    need = cfg.num_class_images - cur
    if need <= 0:
        return
    print(f"Generating {need} class images for prior preservation...")
    from PIL import Image

    bs = 4
    for s in range(0, need, bs):
        n = min(bs, need - s)
        imgs = pipe([cfg.class_prompt] * n,
                    num_inference_steps=cfg.sample_steps,
                    guidance_scale=cfg.sample_guidance_scale,
                    height=cfg.resolution, width=cfg.resolution,
                    rng=jax.random.PRNGKey(cfg.seed + 1000 + s))
        for j in range(n):
            arr = (imgs[j] * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(cfg.class_data_dir, f"gen_{cur + s + j}.jpg"))


def _local_rows(a) -> np.ndarray:
    """Process-local rows (in global row order) of a possibly
    non-addressable global batch array. Under fsdp/tp the batch is
    REPLICATED along those mesh axes, so each row block appears once per
    replica in addressable_shards — dedup by row range."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        uniq = {(s.index[0].start or 0): s for s in a.addressable_shards}
        return np.concatenate(
            [np.asarray(uniq[k].data) for k in sorted(uniq)])
    return np.asarray(a)


def train_dreambooth(pipe: StableDiffusionPipeline,
                     cfg: DreamBoothConfig) -> dict:
    os.makedirs(cfg.output_dir, exist_ok=True)
    dtype = jnp.bfloat16 if cfg.mixed_precision == "bf16" else jnp.float32
    # SDXL: dual text encoders + text_time micro-conditioning. Artifacts go
    # out in the kohya-XL schema (lora_te1_/lora_te2_, LDM unet names) —
    # the reference's indexed format predates SDXL and can't express it.
    is_xl = pipe.unet_cfg.addition_embed_type == "text_time"
    if is_xl:
        if cfg.output_format != "safe":
            raise ValueError(
                "SDXL training saves in the kohya-XL schema only; set "
                "output_format='safe' (the reference's indexed format has "
                "no second text encoder)")
        if cfg.resume_unet or cfg.resume_text_encoder:
            raise ValueError(
                "SDXL training does not support .pt adapter resume; use "
                "save_train_state/resume_state for run continuation")
    # only process 0 writes to the (shared) output dir — metrics, periodic
    # and final artifacts, preemption state (parallel/mesh.is_main_process)
    main = mesh_lib.is_main_process()
    log = MetricsLogger(os.path.join(cfg.output_dir, "metrics.jsonl")
                        if main else None, echo=main)

    if cfg.with_prior_preservation:
        assert cfg.class_data_dir and cfg.class_prompt
        if main:
            generate_class_images(pipe, cfg)
        # other ranks wait for the generated files before building datasets
        mesh_lib.multihost_barrier("class_images")

    mesh = mesh_lib.mesh_from_flags(cfg.data_parallel, cfg.fsdp,
                                    cfg.tensor_parallel)
    # ranks are in lockstep here (post-init / post-barrier); open the
    # cross-process collective contexts NOW, not after the skew-prone
    # train-step compile (parallel/mesh.warm_collectives)
    mesh_lib.warm_collectives(mesh)
    dp = mesh_lib.data_parallel_size(mesh)
    # per-chip batch semantics: every chip sees train_batch_size examples
    global_batch = cfg.train_batch_size * dp

    if cfg.lora_targets == "locon":
        from ..core.sites import text_encoder_locon_sites, unet_locon_sites

        if cfg.output_format != "safe":
            raise ValueError(
                "lora_targets='locon' saves in the kohya schema only; set "
                "output_format='safe' (the flat .pt list has no key names "
                "to carry the extra modules)")
        if cfg.resume_unet or cfg.resume_text_encoder:
            raise ValueError(
                "lora_targets='locon' does not support .pt adapter resume; "
                "use save_train_state/resume_state for run continuation")
        usites = unet_locon_sites(pipe.unet_cfg)
        tsites = text_encoder_locon_sites(pipe.text_cfg)
    elif cfg.lora_targets == "extended":
        from ..formats.safetensors_io import UNET_EXTENDED_TARGET_REPLACE

        usites = unet_lora_sites(pipe.unet_cfg,
                                 set(UNET_EXTENDED_TARGET_REPLACE))
        tsites = text_encoder_lora_sites(pipe.text_cfg)
    elif cfg.lora_targets == "default":
        usites = unet_lora_sites(pipe.unet_cfg)
        tsites = text_encoder_lora_sites(pipe.text_cfg)
    else:
        raise ValueError(
            f"lora_targets must be default|extended|locon, "
            f"got {cfg.lora_targets!r}")
    tsites2 = None
    if is_xl:
        if cfg.lora_targets == "locon":
            from ..core.sites import text_encoder_locon_sites

            tsites2 = text_encoder_locon_sites(pipe.text2_cfg)
        else:
            tsites2 = text_encoder_lora_sites(pipe.text2_cfg)
    trainable = {
        "lora_unet": lora_core.init_lora(
            usites, r=cfg.lora_rank, rng=jax.random.PRNGKey(cfg.seed)),
    }
    if cfg.resume_unet:
        trainable["lora_unet"] = lora_core.lora_from_flat(
            pt_io.load_lora_pt(cfg.resume_unet), usites)
    if cfg.train_text_encoder:
        trainable["lora_text"] = lora_core.init_lora(
            tsites, r=cfg.lora_rank, rng=jax.random.PRNGKey(cfg.seed + 1))
        if cfg.resume_text_encoder:
            trainable["lora_text"] = lora_core.lora_from_flat(
                pt_io.load_lora_pt(cfg.resume_text_encoder), tsites)
        if is_xl:
            trainable["lora_text2"] = lora_core.init_lora(
                tsites2, r=cfg.lora_rank,
                rng=jax.random.PRNGKey(cfg.seed + 2))

    ds = DreamBoothDataset(
        instance_data_root=cfg.instance_data_dir,
        instance_prompt=cfg.instance_prompt,
        tokenizer=pipe.tokenizer,
        class_data_root=cfg.class_data_dir if cfg.with_prior_preservation else None,
        class_prompt=cfg.class_prompt,
        size=cfg.resolution,
        color_jitter=cfg.color_jitter,
        h_flip=cfg.h_flip,
        seed=cfg.seed,
        # SDXL: per-image [orig_h, orig_w, crop_top, crop_left] rows for
        # text_time micro-conditioning (cached latents fix augmentation at
        # cache time and fall back to the constant training-res row)
        return_geometry=is_xl and not cfg.cached_latents,
    )
    from ..data.dataset import prefetch

    if cfg.cached_latents:
        # pre-encode every example once (PTI-style, cli_lora_pti.py:141-151);
        # note: fixes each example's augmentation at cache time
        from ..pipelines.sd import _jit_vae_encode

        def encode_items(n_take, get):
            items = []
            rng_c = jax.random.PRNGKey(cfg.seed + 99)
            for i in range(n_take):
                ex = get(i)
                rng_c, k = jax.random.split(rng_c)
                lat = _jit_vae_encode(
                    pipe.vae_params,
                    jnp.asarray(ex[0][None], dtype), pipe.vae_cfg, k)[0]
                items.append((np.asarray(lat), np.asarray(ex[1], np.int64)))
            return items

        inst = encode_items(
            ds.num_instance_images,
            lambda i: (ds[i]["instance_images"], ds[i]["instance_prompt_ids"]))
        cls_items = []
        if cfg.with_prior_preservation:
            cls_items = encode_items(
                ds.num_class_images,
                lambda i: (ds[i]["class_images"], ds[i]["class_prompt_ids"]))

        import random as _random

        def cached_db_loader():
            # every process draws the same global sample stream (same seed)
            # and keeps its own contiguous slice of rows — shard_batch
            # assembles the global array from process-local rows
            r = _random.Random(cfg.seed)
            pi, pc = jax.process_index(), jax.process_count()
            while True:
                lat = [inst[r.randrange(len(inst))]
                       for _ in range(global_batch)]
                is_inst = np.ones(global_batch, np.float32)
                if cfg.with_prior_preservation:
                    lat += [cls_items[r.randrange(len(cls_items))]
                            for _ in range(global_batch)]
                    is_inst = np.concatenate(
                        [is_inst, np.zeros(global_batch, np.float32)])
                if pc > 1:
                    per = len(lat) // pc
                    lat = lat[pi * per:(pi + 1) * per]
                    is_inst = is_inst[pi * per:(pi + 1) * per]
                batch = {"latents": np.stack([l for l, _ in lat]),
                         "input_ids": np.stack([i for _, i in lat])}
                if cfg.with_prior_preservation:
                    batch["is_instance"] = is_inst
                yield batch

        loader = cached_db_loader()
    else:
        # multihost: each process loads its slice of the global batch from
        # its shard of the sample stream (docs/multihost.md)
        from ..data.dataset import device_prefetch

        local_batch = global_batch // jax.process_count()
        loader = device_prefetch(prefetch(
            data_loader(ds, local_batch, seed=cfg.seed,
                        prior_preservation=cfg.with_prior_preservation,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=cfg.dataloader_num_workers)),
            sharding=mesh_lib.batch_sharding(mesh) if mesh is not None
            else None)

    lr_scale = (cfg.gradient_accumulation_steps * cfg.train_batch_size * dp
                if cfg.scale_lr else 1)
    lrs = {"lora_unet": make_lr_schedule(
        cfg.lr_scheduler, cfg.learning_rate * lr_scale, cfg.max_train_steps,
        cfg.lr_warmup_steps)}
    if cfg.train_text_encoder:
        lrs["lora_text"] = make_lr_schedule(
            cfg.lr_scheduler, cfg.learning_rate_text * lr_scale,
            cfg.max_train_steps, cfg.lr_warmup_steps)
        if is_xl:
            lrs["lora_text2"] = make_lr_schedule(
                cfg.lr_scheduler, cfg.learning_rate_text * lr_scale,
                cfg.max_train_steps, cfg.lr_warmup_steps)
    opt = make_optimizer(trainable, lrs,
                         weight_decay=cfg.adam_weight_decay,
                         max_grad_norm=cfg.max_grad_norm,
                         grad_accum=cfg.gradient_accumulation_steps,
                         low_memory="int8" if cfg.use_8bit_adam else False)

    loss_cfg = LossConfig(
        cached_latents=cfg.cached_latents,
        with_prior_preservation=cfg.with_prior_preservation,
        prior_loss_weight=cfg.prior_loss_weight,
        gradient_checkpointing=cfg.gradient_checkpointing,
    )
    step_fn = make_train_step(
        unet_cfg=pipe.unet_cfg, text_cfg=pipe.text_cfg, vae_cfg=pipe.vae_cfg,
        sched=pipe.schedule, loss_cfg=loss_cfg, optimizer=opt, dtype=dtype,
        mesh=mesh,
        text2_cfg=pipe.text2_cfg if is_xl else None,
        eos_id=int(pipe.tokenizer.eos_token_id) if is_xl else None)

    base = ((pipe.unet_params, pipe.text_params, pipe.text2_params,
             pipe.vae_params) if is_xl
            else (pipe.unet_params, pipe.text_params, pipe.vae_params))
    if mesh is not None:
        base = tuple(mesh_lib.shard_params(
            p, mesh, use_fsdp=cfg.fsdp > 1, use_tp=cfg.tensor_parallel > 1)
            for p in base)
        trainable = mesh_lib.replicate_tree(trainable, mesh)
    opt_state = opt.init(trainable)
    if mesh is not None:
        opt_state = mesh_lib.replicate_tree(opt_state, mesh)

    def save(step_tag: str, final=False):
        if not main:
            return
        name = ("lora_weight" if final else f"lora_weight_s{step_tag}")
        if is_xl:
            from ..formats.kohya import save_kohya_xl

            save_kohya_xl(
                os.path.join(cfg.output_dir, name + ".safetensors"),
                unet_cfg=pipe.unet_cfg,
                lora_unet=trainable.get("lora_unet"), unet_sites=usites,
                lora_text=trainable.get("lora_text"), text_sites=tsites,
                lora_text2=trainable.get("lora_text2"), text2_sites=tsites2)
            return
        if cfg.lora_targets == "locon":
            from ..formats.kohya import save_kohya

            save_kohya(os.path.join(cfg.output_dir, name + ".safetensors"),
                       lora_unet=trainable.get("lora_unet"),
                       unet_sites=usites,
                       lora_text=trainable.get("lora_text"),
                       text_sites=tsites)
            return
        if cfg.output_format in ("safe", "both"):
            from ..formats.safetensors_io import (
                UNET_DEFAULT_TARGET_REPLACE,
                UNET_EXTENDED_TARGET_REPLACE,
            )

            utargets = (UNET_EXTENDED_TARGET_REPLACE
                        if cfg.lora_targets == "extended"
                        else UNET_DEFAULT_TARGET_REPLACE)
            save_all(os.path.join(cfg.output_dir, name + ".safetensors"),
                     lora_unet=trainable.get("lora_unet"), unet_sites=usites,
                     lora_text=trainable.get("lora_text"), text_sites=tsites,
                     save_ti=False, target_replace_module_unet=utargets)
        if cfg.output_format in ("pt", "both"):
            save_all(os.path.join(cfg.output_dir, name + ".pt"),
                     lora_unet=trainable.get("lora_unet"), unet_sites=usites,
                     lora_text=trainable.get("lora_text"), text_sites=tsites,
                     save_ti=False, safe_form=False)

    # frozen-text fast path: the instance/class prompts are fixed, so their
    # embeddings are constants — precompute once and drop CLIP from the hot
    # loop (same trick as VAE latent caching, cli_lora_pti.py:141-151)
    cache_text = cfg.cache_text_embeddings and not cfg.train_text_encoder
    text_emb_cache = {}
    if cache_text:
        from ..pipelines.sd import _jit_text_encode

        if is_xl:
            from .loss import ids2_from_ids
            from ..pipelines.sdxl import _jit_dual_encode

            eos = int(pipe.tokenizer.eos_token_id)

        def _encode_rows(ids_np):
            if is_xl:
                # dual encode: (context 2048-d, te2 pooled) — both cached
                return _jit_dual_encode(
                    pipe.text_params, pipe.text2_params,
                    jnp.asarray(ids_np),
                    jnp.asarray(ids2_from_ids(ids_np, eos)),
                    pipe.text_cfg, pipe.text2_cfg, None, None, dtype, eos)
            return _jit_text_encode(
                pipe.text_params, jnp.asarray(ids_np), pipe.text_cfg,
                None, dtype)

        def embed_ids(ids_batch):
            # multi-process: the prefetched ids span non-addressable
            # devices, so key/encode on THIS process's local rows — the
            # resulting local embedding rows go back through shard_batch's
            # process-local assembly
            ids_np = _local_rows(ids_batch)
            key = ids_np.tobytes()
            if key not in text_emb_cache:
                text_emb_cache[key] = _encode_rows(ids_np)
            return text_emb_cache[key]

    rng = jax.random.PRNGKey(cfg.seed + 7)
    start_step = 0
    if cfg.resume_state:
        from .checkpoint import load_train_state

        trainable, opt_state, start_step, rng = load_train_state(
            cfg.resume_state, trainable, opt_state)
        print(f"Resumed full train state at step {start_step}")

    from .checkpoint import PreemptionGuard
    from .checkpoint import save_train_state as _sts

    t_start = time.perf_counter()
    global_step = start_step
    preempted = False
    loss = jnp.float32(float("nan"))  # defined even if the loop never runs
    micro_steps = cfg.max_train_steps * cfg.gradient_accumulation_steps
    # all ranks must agree on the stop step, or a rank that got SIGTERM
    # first would abandon peers mid-collective
    stop_coord = mesh_lib.PreemptionCoordinator(cfg.preemption_sync_every)
    with PreemptionGuard() as guard:  # handler restored even on raise
        for micro in range(start_step * cfg.gradient_accumulation_steps,
                           micro_steps):
            if stop_coord.should_stop(guard.should_stop, micro):
                # SIGTERM (TPU maintenance / scheduler preemption):
                # checkpoint the FULL train state so --resume_state
                # continues exactly here
                if main:
                    _sts(os.path.join(cfg.output_dir,
                                      "train_state.safetensors"),
                         trainable, opt_state, global_step, rng)
                    save(f"preempt_{global_step}")
                    print(f"Preempted at step {global_step}; "
                          "train state saved")
                preempted = True
                break
            batch = next(loader)
            if cache_text:
                emb = embed_ids(batch.pop("input_ids"))
                if is_xl:
                    (batch["encoder_hidden_states"],
                     batch["add_text_embeds"]) = emb
                else:
                    batch["encoder_hidden_states"] = emb
            if is_xl:
                # text_time micro-conditioning: per-image original size /
                # crop top-left from the dataset transform + the target
                # (training) size, one row per PROCESS-LOCAL batch row
                # (shard_batch assembles host arrays from process-local
                # blocks). Cached latents fixed augmentation at cache time
                # and carry no geometry — constant training-res fallback.
                geom = batch.pop("time_ids_geom", None)
                if geom is not None:
                    g = _local_rows(geom).astype(np.float32)
                    tgt = np.full((g.shape[0], 2), cfg.resolution,
                                  np.float32)
                    batch["add_time_ids"] = np.concatenate([g, tgt], axis=1)
                else:
                    ref = (batch["latents"] if cfg.cached_latents
                           else batch["pixel_values"])
                    nrows = ref.shape[0]
                    if (isinstance(ref, jax.Array)
                            and not ref.is_fully_addressable):
                        nrows //= jax.process_count()
                    row = np.asarray([cfg.resolution, cfg.resolution, 0, 0,
                                      cfg.resolution, cfg.resolution],
                                     np.float32)
                    batch["add_time_ids"] = np.tile(row, (nrows, 1))
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if mesh is not None:
                batch = mesh_lib.shard_batch(batch, mesh)
            rng, krng = jax.random.split(rng)
            trainable, opt_state, loss = step_fn(trainable, opt_state, base,
                                                 batch, krng)
            if micro == start_step * cfg.gradient_accumulation_steps:
                jax.block_until_ready(loss)
                t_start = time.perf_counter()  # exclude compile from steps/sec
            if (micro + 1) % cfg.gradient_accumulation_steps == 0:
                global_step += 1
                if global_step % 10 == 0 or global_step == 1:
                    lf = float(loss)
                    if not np.isfinite(lf):
                        raise FloatingPointError(
                            f"non-finite loss at step {global_step} — check LR "
                            "(reference guidance: ~1e-4 for LoRA) / data")
                    kw = dict(step=global_step, loss=lf)
                    if global_step > 1:  # step 1's window is compile-warped
                        kw["sps"] = global_step / (time.perf_counter()
                                                   - t_start)
                    log.log(**kw)
                if cfg.save_steps and global_step % cfg.save_steps == 0:
                    save(str(global_step))
                    if cfg.save_train_state and main:
                        _sts(os.path.join(cfg.output_dir,
                                          "train_state.safetensors"),
                             trainable, opt_state, global_step, rng)
                    if main:
                        print("moved:",
                              json.dumps({k: round(v[0], 6) for k, v in list(
                                  lora_core.inspect_lora(
                                      trainable["lora_unet"]).items())[:4]}))

    if not preempted:
        # a preempted run must NOT overwrite the completed-run artifact
        # (lora_weight.safetensors) with a partially-trained adapter; its
        # outputs are the preempt_{step} save + train_state.safetensors
        save("final", final=True)
    elapsed = time.perf_counter() - t_start
    result = {"steps": global_step, "seconds": elapsed,
              "steps_per_sec": global_step / max(elapsed, 1e-9),
              "preempted": preempted,
              "final_loss": float(loss)}
    log.log(**result)
    return {**result, "trainable": trainable}
