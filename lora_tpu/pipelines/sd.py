"""Stable Diffusion pipeline (txt2img / img2img / inpaint) in JAX.

Replaces diffusers' StableDiffusionPipeline for everything the reference
does with it (patch_pipe + sampling, SURVEY §3.3). The pipeline object is a
thin host-side orchestrator; all compute is jitted pure functions, so
`tune_lora_scale` (a traced scalar) and LoRA swaps never retrigger
compilation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lora as lora_core
from ..core.sites import text_encoder_lora_sites, unet_lora_sites
from ..data.tokenizer import CLIPTokenizer, default_tokenizer
from ..formats.safetensors_io import (
    SafetensorsFile,
    parse_safeloras,
    parse_safeloras_embeds,
)
from ..models import schedulers
from ..models.clip import clip_text_forward, init_clip_text
from ..models.config import (
    CLIPTextConfig,
    SD15_TEXT,
    SD15_UNET,
    SD15_VAE,
    UNetConfig,
    VAEConfig,
)
from ..models.unet import init_unet, unet_forward
from ..models.vae import init_vae, vae_decode, vae_encode

Params = Dict[str, jax.Array]


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def _jit_text_encode(params, ids, cfg, lora, dtype):
    return clip_text_forward(params, ids, cfg, lora=lora, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_vae_decode(params, z, cfg):
    return vae_decode(params, z, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "sample"))
def _jit_vae_encode(params, x, cfg, rng, sample=True):
    return vae_encode(params, x, cfg, rng, sample=sample)


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "num_inference_steps", "use_cfg", "method"),
)
def _denoise_loop(
    unet_params: Params,
    lora_unet,
    latents: jax.Array,
    text_emb: jax.Array,
    uncond_emb: jax.Array,
    guidance_scale: jax.Array,
    ts: jax.Array,
    sched_alphas: jax.Array,
    final_alpha: jax.Array,
    unet_cfg: UNetConfig,
    num_inference_steps: int,
    use_cfg: bool,
    method: str = "ddim",
    extra_channels: Optional[jax.Array] = None,
    sigmas: Optional[jax.Array] = None,
    noise_rng: Optional[jax.Array] = None,
    lora_idx: Optional[jax.Array] = None,
    add_text_embeds: Optional[jax.Array] = None,
    add_time_ids: Optional[jax.Array] = None,
    blend_mask: Optional[jax.Array] = None,
    blend_z0: Optional[jax.Array] = None,
    blend_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Denoise loop under one jit (ddim | pndm | euler | euler_a | dpm++).
    ts: (S,) int32 descending (PNDM: S = steps+1 with warmup duplicate).
    lora_idx: per-sample adapter routing for stacked LoRAs.
    add_text_embeds/add_time_ids: SDXL text_time micro-conditioning, rows
    aligned with ctx (already uncond+cond-stacked under CFG).
    blend_mask/z0/noise: latent-blend inpainting for plain 4-channel
    checkpoints — after every scheduler step the kept region
    (blend_mask == 0, latent resolution) is overwritten with the original
    latents renoised to the STEPPED-TO noise level (the diffusers legacy /
    A1111 technique). blend_noise is one fixed draw, so the kept region
    follows a single consistent diffusion trajectory; the final step blends
    blend_z0 itself, making kept-region preservation exact in latent
    space. Not supported for pndm (the warmup duplicate makes the
    stepped-to level ill-defined)."""
    sched = schedulers.NoiseSchedule(
        num_train_timesteps=1000, alphas_cumprod=sched_alphas,
        final_alpha_cumprod=final_alpha,
    )
    ctx = jnp.concatenate([uncond_emb, text_emb], 0) if use_cfg else text_emb
    step_delta = 1000 // num_inference_steps
    if lora_idx is not None and lora_unet is not None:
        model_idx = (jnp.concatenate([lora_idx, lora_idx]) if use_cfg
                     else lora_idx)
        lora_unet = {**lora_unet, "idx": model_idx}

    added_cond = None
    if add_text_embeds is not None:
        added_cond = {"text_embeds": add_text_embeds,
                      "time_ids": add_time_ids}

    def eps_at(lat, t, scale_in=None):
        inp = lat if scale_in is None else scale_in
        if extra_channels is not None:
            inp = jnp.concatenate([inp, extra_channels], axis=-1)
        model_in = jnp.concatenate([inp, inp], 0) if use_cfg else inp
        tt = jnp.full((model_in.shape[0],), t, jnp.int32)
        out = unet_forward(unet_params, model_in, tt, ctx, unet_cfg,
                           lora=lora_unet, added_cond=added_cond)
        if use_cfg:
            B = lat.shape[0]
            u, c = out[:B], out[B:]
            out = u + guidance_scale.astype(out.dtype) * (c - u)
        return out

    B = latents.shape[0]

    def blend_t(lat, t_next):
        """Blend the kept region back in at timestep-parametrized noise
        level t_next ((B,) int32; < 0 means fully denoised -> z0)."""
        if blend_mask is None:
            return lat
        known = schedulers.add_noise(sched, blend_z0, blend_noise,
                                     jnp.maximum(t_next, 0))
        known = jnp.where((t_next < 0)[:, None, None, None], blend_z0, known)
        return (blend_mask * lat
                + (1.0 - blend_mask) * known).astype(lat.dtype)

    def blend_sigma(lat, sigma_next):
        """Same in k-diffusion sigma space: x = z0 + sigma * noise
        (sigma_next = 0 on the last step -> exactly z0)."""
        if blend_mask is None:
            return lat
        known = blend_z0 + sigma_next.astype(jnp.float32) * blend_noise
        return (blend_mask * lat
                + (1.0 - blend_mask) * known).astype(lat.dtype)

    if method == "ddim":
        def body(i, lat):
            t = ts[i]
            out = eps_at(lat, t)
            lat = schedulers.ddim_step(
                sched, out, jnp.full((B,), t, jnp.int32), lat,
                jnp.full((B,), t - step_delta, jnp.int32))
            return blend_t(lat, jnp.full((B,), t - step_delta, jnp.int32))

        return jax.lax.fori_loop(0, ts.shape[0], body, latents)

    if method == "pndm":
        if blend_mask is not None:
            raise ValueError(
                "latent-blend inpainting is not supported with the pndm "
                "scheduler (warmup duplicate step); use ddim/euler/dpm++")
        state0 = schedulers.pndm_init_state(latents.shape)

        def body(i, carry):
            lat, state = carry
            t = ts[i]
            out = eps_at(lat, t)
            lat, state = schedulers.pndm_step(sched, state, out, t, lat,
                                              step_delta)
            return lat, state

        latents, _ = jax.lax.fori_loop(0, ts.shape[0], body,
                                       (latents, state0))
        return latents

    if method == "euler":
        def body(i, lat):
            t = ts[i]
            sigma = sigmas[i]
            scaled = schedulers.euler_scale_model_input(lat, sigma)
            out = eps_at(lat, t, scale_in=scaled)
            lat = schedulers.euler_step(lat, out, sigma, sigmas[i + 1])
            return blend_sigma(lat, sigmas[i + 1])

        return jax.lax.fori_loop(0, ts.shape[0], body, latents)

    if method == "euler_a":
        def body(i, lat):
            t = ts[i]
            sigma = sigmas[i]
            scaled = schedulers.euler_scale_model_input(lat, sigma)
            out = eps_at(lat, t, scale_in=scaled)
            noise = jax.random.normal(jax.random.fold_in(noise_rng, i),
                                      lat.shape, jnp.float32)
            lat = schedulers.euler_ancestral_step(lat, out, sigma,
                                                  sigmas[i + 1], noise)
            return blend_sigma(lat, sigmas[i + 1])

        return jax.lax.fori_loop(0, ts.shape[0], body, latents)

    if method == "dpm++":
        n = ts.shape[0]
        ts_next = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
        state0 = schedulers.dpmpp_init_state(latents.shape)

        def body(i, carry):
            lat, state = carry
            out = eps_at(lat, ts[i])
            lat, state = schedulers.dpmpp_step(sched, state, out, ts[i], lat,
                                               ts_next[i])
            return blend_t(lat, jnp.full((B,), ts_next[i], jnp.int32)), state

        latents, _ = jax.lax.fori_loop(0, n, body, (latents, state0))
        return latents

    raise ValueError(f"unknown scheduler method {method}")


def _latent_mask(mask: jax.Array, h: int, w: int, dtype) -> jax.Array:
    """Nearest-sample a pixel-space (B,H,W,1) mask down to the (B,h,w,1)
    latent grid."""
    ys = (jnp.arange(h) * (mask.shape[1] / h)).astype(jnp.int32)
    xs = (jnp.arange(w) * (mask.shape[2] / w)).astype(jnp.int32)
    return mask[:, ys][:, :, xs].astype(dtype)


@dataclasses.dataclass
class StableDiffusionPipeline:
    unet_params: Params
    text_params: Params
    vae_params: Params
    tokenizer: CLIPTokenizer
    unet_cfg: UNetConfig = SD15_UNET
    text_cfg: CLIPTextConfig = SD15_TEXT
    vae_cfg: VAEConfig = SD15_VAE
    schedule: schedulers.NoiseSchedule = None
    dtype: object = jnp.float32
    lora_unet: Optional[dict] = None
    lora_text: Optional[dict] = None
    # bumped whenever the loaded adapters change by means other than
    # tune_lora_scale (patch_pipe / apply_ti / remove_lora), so caches of
    # adapter-dependent results — e.g. the serving embed LRU — can detect
    # staleness that a (text, alpha) key alone would miss
    adapter_generation: int = 0
    # LyCORIS norm/full modules carry deltas on params that are NOT matmul
    # sites (GroupNorm/LayerNorm weight+bias, linear biases). Those apply
    # eagerly to the base params as original + alpha * delta — exact
    # LyCORIS multiplier semantics, since the affected ops are linear in
    # the patched params. {model: {"deltas": {path: d}, "orig": {path: w}}}
    base_deltas: Optional[dict] = None

    def __post_init__(self):
        if self.schedule is None:
            self.schedule = schedulers.make_schedule()

    # -- constructors -------------------------------------------------------
    @classmethod
    def random_init(cls, rng=None, unet_cfg=SD15_UNET, text_cfg=SD15_TEXT,
                    vae_cfg=SD15_VAE, dtype=jnp.float32, tokenizer=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        return cls(
            unet_params=init_unet(unet_cfg, k1, dtype),
            text_params=init_clip_text(text_cfg, k2, dtype),
            vae_params=init_vae(vae_cfg, k3, dtype),
            tokenizer=tokenizer or default_tokenizer(
                vocab_size=text_cfg.vocab_size),
            unet_cfg=unet_cfg, text_cfg=text_cfg, vae_cfg=vae_cfg, dtype=dtype,
        )

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32, tokenizer=None,
                        require_real_tokenizer: bool = True):
        """require_real_tokenizer: with pretrained weights a missing CLIP
        vocab raises rather than silently degrading to hashed ids
        (data/tokenizer.py). Weight-surgery tools (lora_add collapse/export)
        pass False — they never tokenize."""
        from ..models.hf_import import (
            load_pipeline_params,
            load_scheduler_config,
        )

        unet_p, text_p, vae_p, cfgs = load_pipeline_params(path, dtype)
        return cls(unet_params=unet_p, text_params=text_p, vae_params=vae_p,
                   tokenizer=tokenizer or default_tokenizer(
                       path, vocab_size=cfgs[1].vocab_size,
                       require_real=require_real_tokenizer),
                   unet_cfg=cfgs[0], text_cfg=cfgs[1], vae_cfg=cfgs[2],
                   schedule=load_scheduler_config(path), dtype=dtype)

    # -- LoRA / TI management (patch_pipe equivalents) ------------------------
    # model name (as the format layer uses it) -> params attribute
    _PARAMS_ATTR = {"unet": "unet_params", "text_encoder": "text_params"}

    def _install_base_deltas(self, model: str, tree):
        """Pop a LyCORIS tree's `param_deltas` channel (norm-module and
        full-module bias deltas, formats/lycoris.py), record the original
        params, and apply at scale 1. Returns the tree without the
        channel — None if it carried only param deltas."""
        if tree is None or "param_deltas" not in tree:
            return tree
        tree = dict(tree)
        deltas = tree.pop("param_deltas")
        params = getattr(self, self._PARAMS_ATTR[model])
        if self.base_deltas is None:
            self.base_deltas = {}
        self.base_deltas[model] = {
            "deltas": deltas, "orig": {k: params[k] for k in deltas}}
        self._apply_base_deltas(model, 1.0)
        return tree if tree["sites"] else None

    def _apply_base_deltas(self, model: str, alpha: float) -> None:
        rec = (self.base_deltas or {}).get(model)
        if rec is None:
            return
        attr = self._PARAMS_ATTR[model]
        params = dict(getattr(self, attr))
        for k, d in rec["deltas"].items():
            o = rec["orig"][k]
            params[k] = (jnp.asarray(o, jnp.float32)
                         + alpha * jnp.asarray(d, jnp.float32)
                         ).astype(jnp.asarray(o).dtype)
        setattr(self, attr, params)

    def _clear_base_deltas(self, restore: bool = True) -> None:
        for model, rec in (self.base_deltas or {}).items():
            if restore:
                attr = self._PARAMS_ATTR[model]
                setattr(self, attr,
                        {**getattr(self, attr), **rec["orig"]})
        self.base_deltas = None

    def has_base_deltas(self, model: str) -> bool:
        """Whether alpha-dependent base-param deltas (LyCORIS norm/full
        modules) are installed on `model` — serving caches of that model's
        outputs must key on the effective alpha, like a LoRA's."""
        return bool((self.base_deltas or {}).get(model))

    def unet_sites(self, target=None):
        return unet_lora_sites(self.unet_cfg, target)

    def text_sites(self, target=None):
        return text_encoder_lora_sites(self.text_cfg, target)

    def patch_pipe(self, path: str, patch_unet=True, patch_text=True,
                   patch_ti=True) -> Dict[str, np.ndarray]:
        """Load a safetensors LoRA (+TI embeds) into the pipeline.
        Reference patch_pipe, lora.py:958-1022. Files in the kohya-ss /
        webui key schema (lora_unet_*/lora_te_*) are auto-detected and
        routed through formats/kohya.py.

        Loading a new adapter file first restores any base-param deltas
        a previously patched LyCORIS norm/full adapter installed —
        deltas never stack or leak across patch_pipe calls, whatever
        format the replacement is."""
        self._clear_base_deltas()
        with SafetensorsFile(path) as f:
            if any(k.startswith(("lora_unet_", "lora_te_"))
                   for k in f.keys()):
                from ..core.sites import (
                    text_encoder_locon_sites,
                    unet_locon_sites,
                )
                from ..formats.kohya import load_kohya
                from ..formats.lycoris import is_lycoris, load_lycoris

                # widest site sets (the kohya/LoCon supersets: every
                # Linear/Conv2d in transformer+resnet+resampler blocks, and
                # CLIPAttention+CLIPMLP) so full-conv kohya files load; the
                # lora pytree applies wherever a site is present, so
                # attn-only files load identically to before
                u_sites = (unet_locon_sites(self.unet_cfg)
                           if patch_unet else None)
                t_sites = (text_encoder_locon_sites(self.text_cfg)
                           if patch_text else None)
                if is_lycoris(f.keys()):
                    # LoHa/LoKr/IA3/... factor tensors: per-module
                    # dispatch, full-rank modules load as exact delta
                    # entries
                    lu, lt = load_lycoris(
                        path, unet_sites=u_sites, text_sites=t_sites,
                        unet_params=self.unet_params,
                        text_params=self.text_params)
                    lu = self._install_base_deltas("unet", lu)
                    lt = self._install_base_deltas("text_encoder", lt)
                else:
                    lu, lt = load_kohya(
                        path, unet_sites=u_sites, text_sites=t_sites)
                if lu is not None:
                    self.lora_unet = lu
                if lt is not None:
                    self.lora_text = lt
                self.adapter_generation += 1
                return {}  # kohya files carry no TI embeds
            loras = parse_safeloras(f)
            embeds = parse_safeloras_embeds(f)
        if patch_unet and "unet" in loras:
            weights, ranks, target = loras["unet"]
            self.lora_unet = lora_core.lora_from_flat(
                weights, self.unet_sites(set(target)))
        if patch_text and "text_encoder" in loras:
            weights, ranks, target = loras["text_encoder"]
            self.lora_text = lora_core.lora_from_flat(
                weights, self.text_sites(set(target)))
        if patch_ti and embeds:
            self.apply_ti(embeds)
        self.adapter_generation += 1
        return embeds

    def apply_ti(self, embeds: Dict[str, np.ndarray],
                 idempotent: bool = True) -> List[str]:
        """Add TI tokens to the tokenizer and write their rows into (an
        extension of) the embedding table. Reference
        apply_learned_embed_in_clip, lora.py:899-942."""
        key = "text_model.embeddings.token_embedding.weight"
        applied = []
        for token, vec in embeds.items():
            n_added = self.tokenizer.add_tokens(token)
            i = 1
            while n_added == 0 and not idempotent:
                token = f"{token[:-1]}-{i}>"
                n_added = self.tokenizer.add_tokens(token)
                i += 1
            tok_id = self.tokenizer.convert_tokens_to_ids(token)
            table = self.text_params[key]
            if tok_id >= table.shape[0]:
                pad = jnp.zeros((tok_id + 1 - table.shape[0], table.shape[1]),
                                table.dtype)
                table = jnp.concatenate([table, pad], 0)
            table = table.at[tok_id].set(jnp.asarray(vec, table.dtype))
            self.text_params = {**self.text_params, key: table}
            applied.append(token)
        self.adapter_generation += 1
        return applied

    def tune_lora_scale(self, alpha: float, text_alpha: Optional[float] = None):
        if self.lora_unet is not None:
            self.lora_unet = lora_core.tune_lora_scale(self.lora_unet, alpha)
        if self.lora_text is not None:
            self.lora_text = lora_core.tune_lora_scale(
                self.lora_text, alpha if text_alpha is None else text_alpha)
        self._apply_base_deltas("unet", alpha)
        self._apply_base_deltas(
            "text_encoder", alpha if text_alpha is None else text_alpha)

    def remove_lora(self):
        """monkeypatch_remove_lora equivalent (lora.py:812-847)."""
        self.lora_unet = None
        self.lora_text = None
        self._clear_base_deltas()
        self.adapter_generation += 1

    def quantize_base(self):
        """Serving memory lever: int8 per-channel base weights (~2x HBM
        reduction); LoRA/TI stay full precision (core/quantize.py)."""
        from ..core.quantize import quantize_params_int8

        self.unet_params = quantize_params_int8(self.unet_params)
        self.text_params = quantize_params_int8(self.text_params)
        self.vae_params = quantize_params_int8(self.vae_params)

    def collapse_lora(self, alpha: float = 1.0):
        """Fold current LoRAs into base weights (lora.py:635-669).
        Base-param deltas (LyCORIS norm/full modules) fold at the same
        alpha and their restore record is dropped."""
        if self.lora_unet is not None:
            self.unet_params = lora_core.collapse_lora(
                self.unet_params, self.lora_unet, alpha)
        if self.lora_text is not None:
            self.text_params = lora_core.collapse_lora(
                self.text_params, self.lora_text, alpha)
        for model in self.base_deltas or {}:
            self._apply_base_deltas(model, alpha)
        self._clear_base_deltas(restore=False)
        self.remove_lora()

    # -- encoding -----------------------------------------------------------
    def encode_prompt(self, prompt: Union[str, Sequence[str]]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(prompt)["input_ids"], jnp.int32)
        return _jit_text_encode(self.text_params, ids, self.text_cfg,
                                self.lora_text, self.dtype)

    def prepare_latents(self, batch: int, height: int, width: int,
                        rng: jax.Array) -> jax.Array:
        self._check_size(height, width)
        shape = (batch, height // 8, width // 8, self.unet_cfg.out_channels)
        return jax.random.normal(rng, shape, self.dtype)

    def _check_size(self, height: int, width: int) -> None:
        """Latents pass len(block_out_channels)-1 stride-2 stages; sizes that
        don't survive the down/up round trip fail deep in the UNet with a
        concat shape error, so reject them up front (diffusers has the same
        8 * 2^n_down floor)."""
        stride = 8 * 2 ** (len(self.unet_cfg.block_out_channels) - 1)
        if height % stride or width % stride:
            raise ValueError(
                f"height/width must be multiples of {stride} for this UNet "
                f"({len(self.unet_cfg.block_out_channels)} levels); got "
                f"{height}x{width}")

    def _resolve_cond(self, prompt, negative_prompt, use_cfg,
                      prompt_embeds=None, negative_prompt_embeds=None):
        """(text_emb, uncond, B) from prompt strings or precomputed
        embeddings (the serving endpoint's embed-cache passthrough; when
        prompt_embeds is given, prompt strings are ignored)."""
        if prompt_embeds is not None:
            text_emb = jnp.asarray(prompt_embeds, self.dtype)
            if use_cfg and negative_prompt_embeds is None:
                raise ValueError(
                    "negative_prompt_embeds required with prompt_embeds "
                    "when guidance_scale > 1")
            uncond = (jnp.asarray(negative_prompt_embeds, self.dtype)
                      if use_cfg else text_emb)
            return text_emb, uncond, int(text_emb.shape[0])
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompts)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * B
        text_emb = self.encode_prompt(prompts)
        uncond = (self.encode_prompt(list(negative_prompt)) if use_cfg
                  else text_emb)
        return text_emb, uncond, B

    # -- sampling -----------------------------------------------------------
    def _scheduler_arrays(self, method: str, num_inference_steps: int):
        if method == "ddim":
            ts = schedulers.ddim_timesteps(self.schedule, num_inference_steps)
            sigmas = None
        elif method == "euler_a":
            ts = schedulers.euler_timesteps(self.schedule,
                                            num_inference_steps)
            sigmas = jnp.asarray(
                schedulers.euler_sigmas(self.schedule, num_inference_steps))
        elif method == "pndm":
            ts = schedulers.pndm_timesteps(self.schedule, num_inference_steps)
            sigmas = None
        elif method == "euler":
            ts = schedulers.euler_timesteps(self.schedule,
                                            num_inference_steps)
            sigmas = jnp.asarray(
                schedulers.euler_sigmas(self.schedule, num_inference_steps))
        elif method == "dpm++":
            ts = schedulers.dpmpp_timesteps(self.schedule,
                                            num_inference_steps)
            sigmas = None
        elif method in ("euler_karras", "euler_a_karras"):
            sig, ts = schedulers.karras_sigmas(self.schedule,
                                               num_inference_steps)
            sigmas = jnp.asarray(sig)
        else:
            raise ValueError(f"unknown scheduler {method}")
        return jnp.asarray(ts, jnp.int32), sigmas

    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: Union[str, Sequence[str]] = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        height: int = 512,
        width: int = 512,
        rng: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        return_latents: bool = False,
        scheduler: str = "ddim",
        lora_idx: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
    ):
        use_cfg = guidance_scale > 1.0
        text_emb, uncond, B = self._resolve_cond(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        if latents is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            latents = self.prepare_latents(B, height, width, rng)
        ts, sigmas = self._scheduler_arrays(scheduler, num_inference_steps)
        loop_method = {"euler_karras": "euler",
                       "euler_a_karras": "euler_a"}.get(scheduler, scheduler)
        if loop_method in ("euler", "euler_a"):
            # latents are unit-variance noise; euler starts at sigma_max
            latents = latents * sigmas[0].astype(latents.dtype)
        noise_rng = jax.random.fold_in(
            rng if rng is not None else jax.random.PRNGKey(0), 777)
        latents = _denoise_loop(
            self.unet_params, self.lora_unet, latents, text_emb, uncond,
            jnp.float32(guidance_scale), ts, self.schedule.alphas_cumprod,
            jnp.float32(self.schedule.final_alpha_cumprod), self.unet_cfg,
            num_inference_steps, use_cfg, method=loop_method, sigmas=sigmas,
            noise_rng=noise_rng,
            lora_idx=None if lora_idx is None else jnp.asarray(lora_idx,
                                                               jnp.int32))
        images = self._decode(latents, output_type)
        if return_latents:
            return images, latents
        return images

    def _decode(self, latents: jax.Array, output_type: str = "np"):
        """VAE-decode latents to [0,1] images. output_type='device' keeps
        them in HBM — serving paths that PNG-encode elsewhere (or chain
        into further device work) skip the host copy."""
        images = _jit_vae_decode(self.vae_params, latents, self.vae_cfg)
        images = jnp.clip(images.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        if output_type == "device":
            return jax.block_until_ready(images)
        return np.asarray(images)

    def img2img(
        self,
        prompt: Union[str, Sequence[str]],
        init_image: jax.Array,  # (B,H,W,3) in [-1,1]
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Union[str, Sequence[str]] = "",
        rng: Optional[jax.Array] = None,
        lora_idx: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
    ):
        use_cfg = guidance_scale > 1.0
        text_emb, uncond, B = self._resolve_cond(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        self._check_size(init_image.shape[1], init_image.shape[2])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_enc, k_noise = jax.random.split(rng)
        z = _jit_vae_encode(self.vae_params, init_image.astype(self.dtype),
                            self.vae_cfg, k_enc)
        ts_all = schedulers.ddim_timesteps(self.schedule, num_inference_steps)
        t_start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        ts = ts_all[t_start:]
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        z = schedulers.add_noise(self.schedule, z, noise,
                                 jnp.full((B,), int(ts[0]), jnp.int32))
        latents = _denoise_loop(
            self.unet_params, self.lora_unet, z, text_emb, uncond,
            jnp.float32(guidance_scale), jnp.asarray(ts, jnp.int32),
            self.schedule.alphas_cumprod,
            jnp.float32(self.schedule.final_alpha_cumprod), self.unet_cfg,
            num_inference_steps, use_cfg,
            lora_idx=None if lora_idx is None else jnp.asarray(lora_idx,
                                                               jnp.int32))
        return self._decode(latents, output_type)

    def inpaint(
        self,
        prompt: Union[str, Sequence[str]],
        image: jax.Array,        # (B,H,W,3) in [-1,1]
        mask: jax.Array,         # (B,H,W,1) in {0,1}; 1 = repaint
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Union[str, Sequence[str]] = "",
        rng: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
    ):
        """9-channel SD-inpainting sampling (runwayml/sd-inpainting layout):
        unet input = [noisy latents | downsampled mask | masked-image
        latents] — the inference counterpart of train_inpainting
        (cli_lora_pti.py:306-312)."""
        assert self.unet_cfg.in_channels == 9, (
            "inpaint() needs an inpainting UNet (in_channels=9), got "
            f"{self.unet_cfg.in_channels}")
        use_cfg = guidance_scale > 1.0
        text_emb, uncond, B = self._resolve_cond(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        self._check_size(image.shape[1], image.shape[2])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_enc, k_lat = jax.random.split(rng)
        masked = image * (mask < 0.5)
        masked_latents = _jit_vae_encode(
            self.vae_params, masked.astype(self.dtype), self.vae_cfg, k_enc)
        h, w = masked_latents.shape[1:3]
        mask_small = _latent_mask(mask, h, w, self.dtype)
        extra = jnp.concatenate([mask_small, masked_latents], axis=-1)

        latents = jax.random.normal(
            k_lat, (B, h, w, self.unet_cfg.out_channels), self.dtype)
        ts = jnp.asarray(
            schedulers.ddim_timesteps(self.schedule, num_inference_steps),
            jnp.int32)
        latents = _denoise_loop(
            self.unet_params, self.lora_unet, latents, text_emb, uncond,
            jnp.float32(guidance_scale), ts, self.schedule.alphas_cumprod,
            jnp.float32(self.schedule.final_alpha_cumprod), self.unet_cfg,
            num_inference_steps, use_cfg, extra_channels=extra)
        return self._decode(latents, output_type)

    def inpaint_blend(
        self,
        prompt: Union[str, Sequence[str]],
        image: jax.Array,        # (B,H,W,3) in [-1,1]
        mask: jax.Array,         # (B,H,W,1) in {0,1}; 1 = repaint
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Union[str, Sequence[str]] = "",
        rng: Optional[jax.Array] = None,
        scheduler: str = "ddim",
        lora_idx: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
    ):
        """Latent-blend inpainting for PLAIN 4-channel checkpoints (the
        diffusers legacy / A1111 technique — no special inpainting UNet
        needed, unlike inpaint()): start img2img-style from the noised
        original, and after every scheduler step overwrite the kept region
        with the original latents renoised to the stepped-to level, so
        only the masked region is ever resampled. Kept-region preservation
        is exact in latent space (the last step blends the original
        latents themselves); pixel-space deviation is bounded by the VAE
        round-trip. strength semantics match img2img."""
        assert self.unet_cfg.in_channels == self.unet_cfg.out_channels, (
            "inpaint_blend() is the technique for plain checkpoints; a "
            "9-channel inpainting UNet should use inpaint()")
        use_cfg = guidance_scale > 1.0
        text_emb, uncond, B = self._resolve_cond(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        self._check_size(image.shape[1], image.shape[2])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_enc, k_noise = jax.random.split(rng)
        z0 = _jit_vae_encode(self.vae_params, image.astype(self.dtype),
                             self.vae_cfg, k_enc)
        h, w = z0.shape[1:3]
        mask_small = _latent_mask(mask, h, w, jnp.float32)
        noise0 = jax.random.normal(k_noise, z0.shape, jnp.float32)
        ts, sigmas = self._scheduler_arrays(scheduler, num_inference_steps)
        loop_method = {"euler_karras": "euler",
                       "euler_a_karras": "euler_a"}.get(scheduler, scheduler)
        if loop_method == "pndm":
            raise ValueError(
                "latent-blend inpainting is not supported with the pndm "
                "scheduler; use ddim/euler/euler_a/dpm++")
        t_start = max(
            num_inference_steps - int(num_inference_steps * strength), 0)
        ts = ts[t_start:]
        if ts.shape[0] == 0:
            raise ValueError(
                f"strength={strength} leaves zero denoising steps at "
                f"num_inference_steps={num_inference_steps}")
        if loop_method in ("euler", "euler_a"):
            sigmas = sigmas[t_start:]
            latents = (z0 + sigmas[0].astype(jnp.float32) * noise0
                       ).astype(self.dtype)
        else:
            latents = schedulers.add_noise(
                self.schedule, z0, noise0,
                jnp.full((B,), int(ts[0]), jnp.int32)).astype(self.dtype)
        noise_rng = jax.random.fold_in(rng, 777)
        latents = _denoise_loop(
            self.unet_params, self.lora_unet, latents, text_emb, uncond,
            jnp.float32(guidance_scale), jnp.asarray(ts, jnp.int32),
            self.schedule.alphas_cumprod,
            jnp.float32(self.schedule.final_alpha_cumprod), self.unet_cfg,
            num_inference_steps, use_cfg, method=loop_method, sigmas=sigmas,
            noise_rng=noise_rng,
            lora_idx=None if lora_idx is None else jnp.asarray(lora_idx,
                                                               jnp.int32),
            blend_mask=mask_small, blend_z0=z0.astype(jnp.float32),
            blend_noise=noise0)
        return self._decode(latents, output_type)
