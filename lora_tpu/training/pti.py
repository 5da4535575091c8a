"""Pivotal Tuning Inversion — the flagship two-phase trainer
(reference cli_lora_pti.py:696-1040; call stack SURVEY §3.1).

Phase 1 (inversion): only the TI embedding rows train, with the norm prior
(renormalize toward 0.4, lambda=min(1,100*lr)) after each optimizer step.
Phase 2 (tuning): LoRA (default or extended targets) + optional text-encoder
LoRA + optional continued inversion, t_multiplier=0.8, grad clip 1.0.

JAX redesign: the mutable vocabulary becomes a fixed trainable TI buffer
scattered over the (padded) embedding table at forward time; "freezing all
but the embedding rows" is structural (only the buffer is in the grad
pytree), so the reference's frozen-row restoration (cli_lora_pti.py:477-479)
is a no-op by construction.
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
from typing import List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lora as lora_core
from ..core.save import save_all
from ..core.sites import text_encoder_lora_sites, unet_lora_sites
from ..data.dataset import PivotalTuningDataset
from ..formats.safetensors_io import UNET_EXTENDED_TARGET_REPLACE
from ..models.vae import vae_encode
from ..parallel import mesh as mesh_lib
from ..pipelines.sd import StableDiffusionPipeline
from ..utils.metrics import MetricsLogger
from .loss import LossConfig
from .optim import make_lr_schedule, make_optimizer
from .train_step import make_train_step, ti_norm_prior


@dataclasses.dataclass
class PTIConfig:
    instance_data_dir: str = ""
    output_dir: str = "./output"
    train_text_encoder: bool = True
    perform_inversion: bool = True
    use_template: Optional[Literal["object", "style", "null"]] = None
    train_inpainting: bool = False
    placeholder_tokens: str = ""
    placeholder_token_at_data: Optional[str] = None
    initializer_tokens: Optional[str] = None
    seed: int = 42
    resolution: int = 512
    color_jitter: bool = True
    train_batch_size: int = 1
    max_train_steps_tuning: int = 1000
    max_train_steps_ti: int = 1000
    save_steps: int = 100
    gradient_accumulation_steps: int = 4
    gradient_checkpointing: bool = False
    lora_rank: int = 4
    lora_unet_target_modules: frozenset = frozenset(
        {"CrossAttention", "Attention", "GEGLU"})
    lora_clip_target_modules: frozenset = frozenset({"CLIPAttention"})
    lora_dropout_p: float = 0.0
    lora_scale: float = 1.0
    use_extended_lora: bool = False
    # "default" | "extended" | "locon". locon trains the full kohya/LoCon
    # module superset and saves the pair convention: <name>.safetensors in
    # the kohya schema + <name>.embeds.pt as an A1111 textual embedding
    # (the reference format cannot carry conv sites, and the kohya file
    # cannot carry TI embeds — the webui convention splits them, the same
    # pair lora_add upl-ckpt-v2 emits, cli/lora_add.py:104-107)
    lora_targets: str = "default"
    clip_ti_decay: bool = True
    learning_rate_unet: float = 1e-4
    learning_rate_text: float = 1e-5
    learning_rate_ti: float = 5e-4
    continue_inversion: bool = False
    continue_inversion_lr: Optional[float] = None
    use_face_segmentation_condition: bool = False
    cached_latents: bool = True
    dataloader_num_workers: int = 0  # thread-pool sample decode (0 = serial)
    use_mask_captioned_data: bool = False
    mask_temperature: float = 1.0
    scale_lr: bool = False
    lr_scheduler: str = "linear"
    lr_warmup_steps: int = 0
    lr_scheduler_lora: str = "linear"
    lr_warmup_steps_lora: int = 0
    weight_decay_ti: float = 0.0
    weight_decay_lora: float = 0.001
    max_grad_norm: float = 1.0
    out_name: str = "final_lora"
    mixed_precision: Optional[str] = None
    # mesh axes (per-chip batch semantics: global = train_batch_size x dp)
    data_parallel: bool = False
    fsdp: int = 1
    tensor_parallel: int = 1
    preemption_sync_every: int = 10  # multihost stop-agreement interval
    log_wandb: bool = False


def parse_token_args(cfg: PTIConfig):
    if len(cfg.placeholder_tokens) == 0:
        placeholder_tokens: List[str] = []
    else:
        placeholder_tokens = cfg.placeholder_tokens.split("|")
        assert sorted(placeholder_tokens) == placeholder_tokens, (
            "Placeholder tokens should be sorted. Use something like "
            f"{'|'.join(sorted(placeholder_tokens))}")
    if cfg.initializer_tokens is None:
        initializer_tokens = ["<rand-0.017>"] * len(placeholder_tokens)
    else:
        initializer_tokens = cfg.initializer_tokens.split("|")
    assert len(initializer_tokens) == len(placeholder_tokens), (
        "Unequal Initializer token for Placeholder tokens.")
    if cfg.placeholder_token_at_data is not None:
        tok, pat = cfg.placeholder_token_at_data.split("|")
        token_map = {tok: pat}
    else:
        token_map = {"DUMMY": "".join(placeholder_tokens)}
    return placeholder_tokens, initializer_tokens, token_map


def setup_ti(pipe: StableDiffusionPipeline, placeholder_tokens,
             initializer_tokens, rng) -> tuple:
    """Add placeholder tokens, build the initial TI buffer
    (reference get_models token init, cli_lora_pti.py:72-109)."""
    key = "text_model.embeddings.token_embedding.weight"
    table = pipe.text_params[key]
    ids, inits = [], []
    for token, init_tok in zip(placeholder_tokens, initializer_tokens):
        if pipe.tokenizer.add_tokens(token) == 0:
            raise ValueError(
                f"The tokenizer already contains the token {token}.")
        tok_id = pipe.tokenizer.convert_tokens_to_ids(token)
        ids.append(tok_id)
        rng, k = jax.random.split(rng)
        if init_tok.startswith("<rand"):
            sigma = float(re.findall(r"<rand-(.*)>", init_tok)[0])
            inits.append(jax.random.normal(k, (table.shape[1],),
                                           jnp.float32) * sigma)
        elif init_tok == "<zero>":
            inits.append(jnp.zeros((table.shape[1],), jnp.float32))
        else:
            tids = pipe.tokenizer.encode(init_tok)
            if len(tids) > 1:
                raise ValueError("The initializer token must be a single token.")
            inits.append(table[tids[0]].astype(jnp.float32))
    if not ids:
        return jnp.zeros((0,), jnp.int32), jnp.zeros((0, table.shape[1]))
    # pad the table so scattered ids are in range
    max_id = max(ids)
    if max_id >= table.shape[0]:
        pad = jnp.zeros((max_id + 1 - table.shape[0], table.shape[1]),
                        table.dtype)
        pipe.text_params = {**pipe.text_params,
                            key: jnp.concatenate([table, pad], 0)}
    return jnp.asarray(ids, jnp.int32), jnp.stack(inits)


def cache_latents(pipe, dataset, rng):
    """Pre-encode every image once through the VAE
    (cli_lora_pti.py:141-151).

    Inpainting datasets additionally cache the masked-image latents and the
    latent-resolution hole mask, so the training hot loop never runs the VAE
    (the reference cannot cache inpainting at all, cli_lora_pti.py:856).
    Trade-off vs the uncached path: one sampled hole per image is frozen for
    the whole run instead of resampled per epoch."""
    from .loss import _resize_mask_nearest

    encode = jax.jit(lambda x, k: vae_encode(pipe.vae_params, x, pipe.vae_cfg,
                                             k))
    items = []
    for i in range(len(dataset)):
        ex = dataset[i]
        rng, k = jax.random.split(rng)
        lat = encode(jnp.asarray(ex["instance_images"])[None], k)[0]
        item = {"latents": np.asarray(lat),
                "input_ids": np.asarray(ex["instance_prompt_ids"], np.int64)}
        if "mask" in ex:
            item["mask"] = ex["mask"].astype(np.float32)
        if "instance_masks" in ex:  # inpainting
            rng, km = jax.random.split(rng)
            mlat = encode(jnp.asarray(ex["instance_masked_images"])[None], km)
            item["masked_image_latents"] = np.asarray(mlat[0])
            small = _resize_mask_nearest(
                jnp.asarray(ex["instance_masks"], jnp.float32)[None],
                lat.shape[0], lat.shape[1])[0]
            item["mask_values"] = np.asarray(small, np.float32)
        items.append(item)
    return items


def cached_loader(items, batch_size, seed=0):
    """Yields batches of `batch_size` global rows; under multi-process every
    process draws the same stream (same seed) and keeps its contiguous
    slice — shard_batch assembles the global array from local rows."""
    import random as _random

    rng = _random.Random(seed)
    pi, pc = jax.process_index(), jax.process_count()
    while True:
        idxs = list(range(len(items)))
        rng.shuffle(idxs)
        while len(idxs) < batch_size:  # tiny datasets: repeat
            idxs = idxs + idxs
        for s in range(0, len(idxs) - batch_size + 1, batch_size):
            take = idxs[s:s + batch_size]
            if pc > 1:
                per = batch_size // pc
                take = take[pi * per:(pi + 1) * per]
            chunk = [items[i] for i in take]
            yield {key: np.stack([c[key] for c in chunk])
                   for key in chunk[0]}


def train_pti(pipe: StableDiffusionPipeline, cfg: PTIConfig) -> dict:
    if cfg.lora_targets not in ("default", "extended", "locon"):
        raise ValueError(f"lora_targets must be default|extended|locon, "
                         f"got {cfg.lora_targets!r}")
    if cfg.lora_targets == "locon" and cfg.use_extended_lora:
        raise ValueError("use_extended_lora conflicts with "
                         "lora_targets='locon' (locon already covers the "
                         "extended conv sites); pass exactly one")
    locon = cfg.lora_targets == "locon"
    os.makedirs(cfg.output_dir, exist_ok=True)
    dtype = jnp.bfloat16 if cfg.mixed_precision == "bf16" else jnp.float32
    # only process 0 writes artifacts/metrics to the (shared) output dir
    main = mesh_lib.is_main_process()
    log = MetricsLogger(os.path.join(cfg.output_dir, "metrics.jsonl")
                        if main else None, use_wandb=cfg.log_wandb and main,
                        echo=main)
    rng = jax.random.PRNGKey(cfg.seed)

    placeholder_tokens, initializer_tokens, token_map = parse_token_args(cfg)
    rng, k_ti = jax.random.split(rng)
    ti_ids, ti_init = setup_ti(pipe, placeholder_tokens, initializer_tokens,
                               k_ti)

    mesh = mesh_lib.mesh_from_flags(cfg.data_parallel, cfg.fsdp,
                                    cfg.tensor_parallel)
    mesh_lib.warm_collectives(mesh)  # open Gloo/ICI contexts in lockstep
    dp = mesh_lib.data_parallel_size(mesh)
    global_batch = cfg.train_batch_size * dp  # per-chip batch semantics

    ga = cfg.gradient_accumulation_steps
    if cfg.scale_lr:
        unet_lr = cfg.learning_rate_unet * ga * cfg.train_batch_size * dp
        text_lr = cfg.learning_rate_text * ga * cfg.train_batch_size * dp
        ti_lr = cfg.learning_rate_ti * ga * cfg.train_batch_size * dp
    else:
        unet_lr, text_lr, ti_lr = (cfg.learning_rate_unet,
                                   cfg.learning_rate_text,
                                   cfg.learning_rate_ti)

    dataset = PivotalTuningDataset(
        instance_data_root=cfg.instance_data_dir,
        token_map=token_map,
        use_template=cfg.use_template,
        tokenizer=pipe.tokenizer,
        size=cfg.resolution,
        color_jitter=cfg.color_jitter,
        use_face_segmentation_condition=cfg.use_face_segmentation_condition,
        use_mask_captioned_data=cfg.use_mask_captioned_data,
        train_inpainting=cfg.train_inpainting,
        blur_amount=200,  # TI phase (cli_lora_pti.py:853)
        seed=cfg.seed,
    )

    if cfg.cached_latents:
        rng, k_cache = jax.random.split(rng)
        items = cache_latents(pipe, dataset, k_cache)
        loader = cached_loader(items, global_batch, cfg.seed)
    else:
        from ..data.dataset import data_loader, device_prefetch, prefetch

        local_batch = global_batch // jax.process_count()
        loader = device_prefetch(
            prefetch(data_loader(dataset, local_batch, seed=cfg.seed,
                                 process_index=jax.process_index(),
                                 process_count=jax.process_count(),
                                 num_workers=cfg.dataloader_num_workers)),
            sharding=mesh_lib.batch_sharding(mesh) if mesh is not None
            else None)

    base = (pipe.unet_params, pipe.text_params, pipe.vae_params)
    if mesh is not None:
        base = tuple(mesh_lib.shard_params(
            p, mesh, use_fsdp=cfg.fsdp > 1, use_tp=cfg.tensor_parallel > 1)
            for p in base)
    if locon:
        from ..core.sites import text_encoder_locon_sites, unet_locon_sites

        usites = unet_locon_sites(pipe.unet_cfg)
        tsites = text_encoder_locon_sites(pipe.text_cfg)
        unet_targets = set()  # kohya files carry no target-set metadata
    else:
        extended = cfg.use_extended_lora or cfg.lora_targets == "extended"
        usites = unet_lora_sites(pipe.unet_cfg,
                                 set(cfg.lora_unet_target_modules)
                                 | (UNET_EXTENDED_TARGET_REPLACE
                                    if extended else set()))
        tsites = text_encoder_lora_sites(pipe.text_cfg,
                                         set(cfg.lora_clip_target_modules))
        unet_targets = (set(cfg.lora_unet_target_modules)
                        | (UNET_EXTENDED_TARGET_REPLACE if extended
                           else set()))

    def embeds_dict(ti_embeds):
        return {tok: np.asarray(ti_embeds[i], np.float32)
                for i, tok in enumerate(placeholder_tokens)}

    def run_phase(trainable, lrs, steps, loss_cfg, phase_name, save_fn,
                  apply_norm_prior, ti_lr_sched=None):
        opt = make_optimizer(
            trainable, lrs, weight_decay=cfg.weight_decay_lora,
            max_grad_norm=cfg.max_grad_norm
            if phase_name == "tune" else None,
            grad_accum=ga)
        step_fn = make_train_step(
            unet_cfg=pipe.unet_cfg, text_cfg=pipe.text_cfg,
            vae_cfg=pipe.vae_cfg, sched=pipe.schedule, loss_cfg=loss_cfg,
            optimizer=opt, ti_ids=ti_ids if "ti" in trainable else None,
            dtype=dtype, mesh=mesh)
        opt_state = opt.init(trainable)
        if mesh is not None:
            trainable = mesh_lib.replicate_tree(trainable, mesh)
            opt_state = mesh_lib.replicate_tree(opt_state, mesh)
        nonlocal rng
        from .checkpoint import PreemptionGuard

        t0 = time.perf_counter()
        global_step = 0
        loss = jnp.float32(0)
        preempted = False
        # multihost-consistent stop (see dreambooth.py / mesh.py)
        stop_coord = mesh_lib.PreemptionCoordinator(cfg.preemption_sync_every)
        with PreemptionGuard() as guard:  # handler restored even on raise
            for micro in range(steps * ga):
                if stop_coord.should_stop(guard.should_stop, micro):
                    # SIGTERM: save the phase's adapters/embeds and stop cleanly
                    save_fn(trainable, global_step)
                    preempted = True
                    print(f"Preempted in {phase_name} at step {global_step}; "
                          "artifacts saved")
                    break
                batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
                if mesh is not None:
                    batch = mesh_lib.shard_batch(batch, mesh)
                rng, k = jax.random.split(rng)
                trainable, opt_state, loss = step_fn(trainable, opt_state, base,
                                                     batch, k)
                if (micro + 1) % ga == 0:
                    global_step += 1
                    if apply_norm_prior and "ti" in trainable and cfg.clip_ti_decay:
                        lr_now = float(ti_lr_sched(global_step)) \
                            if callable(ti_lr_sched) else ti_lr
                        trainable["ti"]["embeds"] = ti_norm_prior(
                            trainable["ti"]["embeds"], lr_now)
                    if global_step % 20 == 0 or global_step == 1:
                        lf = float(loss)
                        if not np.isfinite(lf):
                            raise FloatingPointError(
                                f"non-finite loss in {phase_name} at step "
                                f"{global_step}")
                        kw = dict(phase=phase_name, step=global_step,
                                  loss=lf)
                        if global_step > 1:  # step 1 is compile-warped
                            kw["sps"] = global_step / (time.perf_counter()
                                                       - t0)
                        log.log(**kw)
                    if cfg.save_steps and global_step % cfg.save_steps == 0:
                        save_fn(trainable, global_step)
                if global_step >= steps:
                    break
        return trainable, float(loss), preempted

    ti_embeds = ti_init
    # ---------------- Phase 1: inversion ----------------
    if cfg.perform_inversion and len(placeholder_tokens) > 0:
        ti_sched = make_lr_schedule(cfg.lr_scheduler, ti_lr,
                                    cfg.max_train_steps_ti,
                                    cfg.lr_warmup_steps)
        trainable = {"ti": {"embeds": ti_init}}

        def save_inv(tr, step):
            if not main:
                return
            save_all(os.path.join(cfg.output_dir,
                                  f"step_inv_{step}.safetensors"),
                     embeds=embeds_dict(tr["ti"]["embeds"]), save_lora=False)

        loss_cfg = LossConfig(cached_latents=cfg.cached_latents,
                              train_inpainting=cfg.train_inpainting,
                              gradient_checkpointing=cfg.gradient_checkpointing)
        trainable, inv_loss, preempted = run_phase(
            trainable, {"ti": ti_sched}, cfg.max_train_steps_ti, loss_cfg,
            "inversion", save_inv, apply_norm_prior=True,
            ti_lr_sched=ti_sched)
        ti_embeds = trainable["ti"]["embeds"]
        log.log(phase="inversion", final_loss=inv_loss)
        if preempted:
            # SIGTERM during inversion: do NOT proceed to tuning or write
            # the final artifact — the step_inv_* save above is the output
            return {"trainable": trainable, "ti_ids": np.asarray(ti_ids),
                    "placeholder_tokens": placeholder_tokens,
                    "final_loss": inv_loss, "preempted": True}

    # ---------------- Phase 2: tuning ----------------
    dataset.blur_amount = 70  # (cli_lora_pti.py:1003)
    rng, k_lora, k_lora_t = jax.random.split(rng, 3)
    trainable = {"lora_unet": lora_core.init_lora(
        usites, r=cfg.lora_rank, rng=k_lora, scale=cfg.lora_scale)}
    lrs = {"lora_unet": make_lr_schedule(
        cfg.lr_scheduler_lora, unet_lr, cfg.max_train_steps_tuning,
        cfg.lr_warmup_steps_lora)}
    if cfg.continue_inversion and len(placeholder_tokens) > 0:
        trainable["ti"] = {"embeds": ti_embeds}
        lrs["ti"] = (cfg.continue_inversion_lr
                     if cfg.continue_inversion_lr is not None else ti_lr)
    else:
        # write learned embeds into the table so phase 2 conditions on them
        key = "text_model.embeddings.token_embedding.weight"
        table = pipe.text_params[key]
        if len(placeholder_tokens):
            table = table.at[ti_ids].set(ti_embeds.astype(table.dtype))
            pipe.text_params = {**pipe.text_params, key: table}
            base = (pipe.unet_params, pipe.text_params, pipe.vae_params)
    if cfg.train_text_encoder:
        trainable["lora_text"] = lora_core.init_lora(
            tsites, r=cfg.lora_rank, rng=k_lora_t)
        lrs["lora_text"] = make_lr_schedule(
            cfg.lr_scheduler_lora, text_lr, cfg.max_train_steps_tuning,
            cfg.lr_warmup_steps_lora)

    def save_tune(tr, step, name=None):
        if not main:
            return
        emb = embeds_dict(tr["ti"]["embeds"] if "ti" in tr else ti_embeds) \
            if len(placeholder_tokens) else None
        out = os.path.join(cfg.output_dir,
                           name or f"step_{step}.safetensors")
        if locon:
            # pair convention (see PTIConfig.lora_targets): kohya LoRA +
            # A1111 embedding sidecar, since neither format holds both
            from ..formats.kohya import save_kohya
            from ..formats.pt_io import save_a1111_multi_embedding

            save_kohya(out, lora_unet=tr.get("lora_unet"), unet_sites=usites,
                       lora_text=tr.get("lora_text"), text_sites=tsites)
            if emb:
                save_a1111_multi_embedding(
                    emb, out[:-len(".safetensors")] + ".embeds.pt",
                    name=cfg.out_name)
        else:
            save_all(out,
                     lora_unet=tr.get("lora_unet"), unet_sites=usites,
                     lora_text=tr.get("lora_text"), text_sites=tsites,
                     embeds=emb, save_ti=emb is not None,
                     target_replace_module_unet=unet_targets,
                     target_replace_module_text=set(
                         cfg.lora_clip_target_modules))
        if cfg.log_wandb and name is None:
            # CLIP-alignment eval at save intervals (cli_lora_pti.py:527-539)
            try:
                import dataclasses as _dc

                from PIL import Image as _Image

                from ..utils.eval import evaluate_pipe, prepare_clip_model_sets

                p_eval = _dc.replace(pipe)
                p_eval.lora_unet = tr.get("lora_unet")
                p_eval.lora_text = tr.get("lora_text")
                if emb:
                    p_eval.apply_ti(emb)
                targets = [
                    _Image.open(os.path.join(cfg.instance_data_dir, f))
                    for f in os.listdir(cfg.instance_data_dir)
                    if f.lower().endswith((".png", ".jpg", ".jpeg"))]
                scores = evaluate_pipe(
                    p_eval, targets, class_token="".join(initializer_tokens),
                    learnt_token="".join(placeholder_tokens),
                    clip_model_sets=prepare_clip_model_sets(),
                    n_test=4, n_step=20)
                log.log(phase="eval", step=step, **scores)
            except Exception as e:  # eval must never kill training
                print(f"eval skipped: {e}")

    loss_cfg = LossConfig(cached_latents=cfg.cached_latents,
                          train_inpainting=cfg.train_inpainting,
                          t_multiplier=0.8,
                          mask_temperature=cfg.mask_temperature,
                          lora_dropout_p=cfg.lora_dropout_p,
                          gradient_checkpointing=cfg.gradient_checkpointing)
    trainable, tune_loss, preempted = run_phase(
        trainable, lrs, cfg.max_train_steps_tuning, loss_cfg, "tune",
        save_tune, apply_norm_prior=False)

    print("PTI : drift:", {k: round(v[0], 6) for k, v in list(
        lora_core.inspect_lora(trainable["lora_unet"]).items())[:4]})
    if not preempted:
        # a preempted run keeps its step_* phase save; don't write the
        # completed-run artifact name with a partially-tuned adapter
        save_tune(trainable, 0, name=f"{cfg.out_name}.safetensors")
    log.log(phase="tune", final_loss=tune_loss)
    return {"trainable": trainable, "ti_ids": np.asarray(ti_ids),
            "placeholder_tokens": placeholder_tokens,
            "final_loss": tune_loss, "preempted": preempted}
