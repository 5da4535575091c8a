"""Stable Diffusion XL pipeline (txt2img / img2img / inpaint) in JAX.

The reference repo predates SDXL; this exists for the same migration
reason as formats/kohya.py — users arriving with SDXL checkpoints and
LoRAs. Architectural deltas vs pipelines/sd.py:

- DUAL text encoders: CLIP ViT-L (te1) and OpenCLIP ViT-bigG (te2), both
  consumed at their PENULTIMATE hidden state (no final LayerNorm) and
  concatenated along features (768 + 1280 = 2048 = cross_attention_dim).
- text_time micro-conditioning: te2's projected pooled EOS embedding plus
  six time_ids (original size / crop / target size) feed the UNet's
  add_embedding MLP (models/unet.py).
- tokenizer_2 pads with "!" (id 0) instead of EOS — the pad identity
  reaches the conditioning because every position feeds cross-attention.

Everything else (schedulers, CFG, the single-jit denoise loop, LoRA as a
traced pytree) is shared with pipelines/sd.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lora as lora_core
from ..data.tokenizer import CLIPTokenizer, default_tokenizer
from ..models import schedulers
from ..models.clip import clip_text_forward, init_clip_text
from ..models.config import (
    CLIPTextConfig,
    SDXL_TEXT,
    SDXL_TEXT2,
    SDXL_UNET,
    SDXL_VAE,
    UNetConfig,
    VAEConfig,
)
from ..models.unet import init_unet
from ..models.vae import init_vae
from .sd import StableDiffusionPipeline, _denoise_loop, _jit_vae_encode

Params = Dict[str, jax.Array]


@functools.partial(
    jax.jit, static_argnames=("cfg1", "cfg2", "dtype", "eos2"))
def _jit_dual_encode(p1, p2, ids1, ids2, cfg1, cfg2, lora1, lora2, dtype,
                     eos2):
    h1 = clip_text_forward(p1, ids1, cfg1, lora=lora1, dtype=dtype,
                           penultimate=True)
    h2, pooled = clip_text_forward(p2, ids2, cfg2, lora=lora2, dtype=dtype,
                                   penultimate=True, pooled_eos_id=eos2)
    return jnp.concatenate([h1, h2.astype(h1.dtype)], -1), pooled


@dataclasses.dataclass
class StableDiffusionXLPipeline(StableDiffusionPipeline):
    """SDXL: StableDiffusionPipeline plus a second text encoder and the
    text_time added conditioning. text_params/text_cfg/lora_text are te1
    (CLIP ViT-L); te2 lives in text2_params/text2_cfg/lora_text2."""

    text2_params: Params = None
    text2_cfg: CLIPTextConfig = SDXL_TEXT2
    lora_text2: Optional[dict] = None

    _PARAMS_ATTR = {"unet": "unet_params", "text_encoder": "text_params",
                    "text_encoder_2": "text2_params"}

    def __post_init__(self):
        super().__post_init__()
        if self.text2_params is None:
            raise ValueError("StableDiffusionXLPipeline needs text2_params")
        if self.unet_cfg.addition_embed_type != "text_time":
            raise ValueError(
                "StableDiffusionXLPipeline needs an SDXL UNet config "
                "(addition_embed_type='text_time')")

    # -- constructors --------------------------------------------------------
    @classmethod
    def random_init(cls, rng=None, unet_cfg=SDXL_UNET, text_cfg=SDXL_TEXT,
                    text2_cfg=SDXL_TEXT2, vae_cfg=SDXL_VAE,
                    dtype=jnp.float32, tokenizer=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return cls(
            unet_params=init_unet(unet_cfg, k1, dtype),
            text_params=init_clip_text(text_cfg, k2, dtype),
            text2_params=init_clip_text(text2_cfg, k4, dtype),
            vae_params=init_vae(vae_cfg, k3, dtype),
            tokenizer=tokenizer or default_tokenizer(
                vocab_size=min(text_cfg.vocab_size, text2_cfg.vocab_size)),
            unet_cfg=unet_cfg, text_cfg=text_cfg, text2_cfg=text2_cfg,
            vae_cfg=vae_cfg, dtype=dtype,
        )

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32, tokenizer=None,
                        require_real_tokenizer: bool = True):
        import os

        from ..models.hf_import import (
            load_pipeline_params,
            load_scheduler_config,
            load_text_encoder,
        )

        unet_p, text_p, vae_p, cfgs = load_pipeline_params(path, dtype)
        text2_p, text2_cfg = load_text_encoder(
            os.path.join(path, "text_encoder_2"), dtype)
        return cls(unet_params=unet_p, text_params=text_p,
                   text2_params=text2_p, vae_params=vae_p,
                   tokenizer=tokenizer or default_tokenizer(
                       path, vocab_size=cfgs[1].vocab_size,
                       require_real=require_real_tokenizer),
                   unet_cfg=cfgs[0], text_cfg=cfgs[1], text2_cfg=text2_cfg,
                   vae_cfg=cfgs[2],
                   schedule=load_scheduler_config(path), dtype=dtype)

    # -- LoRA management -----------------------------------------------------
    def text2_sites(self):
        from ..core.sites import text_encoder_lora_sites

        return text_encoder_lora_sites(self.text2_cfg)

    def patch_pipe(self, path: str, patch_unet=True, patch_text=True,
                   patch_ti=True):
        """Load an SDXL kohya-schema LoRA (lora_unet_ + lora_te1_/lora_te2_
        keys, LDM input/middle/output_blocks unet naming) onto the pipe.
        LyCORIS algorithm files (LoHa/LoKr/IA3/DoRA/diag-OFT) are
        auto-detected and dispatched per module, same as SD1.x
        patch_pipe."""
        from ..core.sites import (
            text_encoder_locon_sites,
            unet_locon_sites,
        )
        from ..formats.kohya import load_kohya_xl
        from ..formats.lycoris import is_lycoris, load_lycoris_xl
        from ..formats.reader import SafetensorsFile

        u_sites = unet_locon_sites(self.unet_cfg) if patch_unet else None
        t_sites = (text_encoder_locon_sites(self.text_cfg)
                   if patch_text else None)
        t2_sites = (text_encoder_locon_sites(self.text2_cfg)
                    if patch_text else None)
        self._clear_base_deltas()  # a replaced adapter's norm/full deltas
        with SafetensorsFile(path) as f:
            lycoris = is_lycoris(f.keys())
        if lycoris:
            lu, lt1, lt2 = load_lycoris_xl(
                path, unet_cfg=self.unet_cfg, unet_sites=u_sites,
                text_sites=t_sites, text2_sites=t2_sites,
                unet_params=self.unet_params, text_params=self.text_params,
                text2_params=self.text2_params)
            lu = self._install_base_deltas("unet", lu)
            lt1 = self._install_base_deltas("text_encoder", lt1)
            lt2 = self._install_base_deltas("text_encoder_2", lt2)
        else:
            lu, lt1, lt2 = load_kohya_xl(
                path, unet_cfg=self.unet_cfg, unet_sites=u_sites,
                text_sites=t_sites, text2_sites=t2_sites)
        if lu is not None:
            self.lora_unet = lu
        if lt1 is not None:
            self.lora_text = lt1
        if lt2 is not None:
            self.lora_text2 = lt2
        self.adapter_generation += 1
        return {}

    def tune_lora_scale(self, alpha: float,
                        text_alpha: Optional[float] = None):
        super().tune_lora_scale(alpha, text_alpha)
        if self.lora_text2 is not None:
            self.lora_text2 = lora_core.tune_lora_scale(
                self.lora_text2, alpha if text_alpha is None else text_alpha)
        self._apply_base_deltas(
            "text_encoder_2", alpha if text_alpha is None else text_alpha)

    def remove_lora(self):
        super().remove_lora()
        self.lora_text2 = None

    def collapse_lora(self, alpha: float = 1.0):
        if self.lora_text2 is not None:
            self.text2_params = lora_core.collapse_lora(
                self.text2_params, self.lora_text2, alpha)
        super().collapse_lora(alpha)  # folds base_deltas for ALL models

    # -- encoding ------------------------------------------------------------
    def encode_prompt_xl(
        self, prompt: Union[str, Sequence[str]],
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (context (B, 77, d1+d2), pooled (B, projection_dim)):
        both encoders' penultimate states concatenated, plus te2's
        projected pooled EOS embedding."""
        ids1 = jnp.asarray(self.tokenizer(prompt)["input_ids"], jnp.int32)
        ids2 = jnp.asarray(
            self.tokenizer(prompt, pad_token_id=0)["input_ids"], jnp.int32)
        return _jit_dual_encode(
            self.text_params, self.text2_params, ids1, ids2,
            self.text_cfg, self.text2_cfg, self.lora_text, self.lora_text2,
            self.dtype, int(self.tokenizer.eos_token_id))

    def _time_ids(self, B: int, height: int, width: int,
                  original_size, crops_coords_top_left, target_size):
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        row = list(original_size) + list(crops_coords_top_left) + list(
            target_size)
        return jnp.asarray(np.tile(np.asarray(row, np.float32), (B, 1)))

    def _resolve_cond_xl(self, prompt, negative_prompt, use_cfg,
                         prompt_embeds=None, negative_prompt_embeds=None):
        """(text_emb, uncond, add_text, B) from prompt strings or
        precomputed (context, pooled) pairs (the serving endpoint's
        embed-cache passthrough; when prompt_embeds is given, prompt
        strings are ignored). add_text is the text_time pooled row,
        uncond+cond-stacked under CFG."""
        if prompt_embeds is not None:
            text_emb, pooled = (jnp.asarray(e, self.dtype)
                                for e in prompt_embeds)
            if use_cfg:
                if negative_prompt_embeds is None:
                    raise ValueError(
                        "negative_prompt_embeds required with "
                        "prompt_embeds when guidance_scale > 1")
                uncond, uncond_pooled = (jnp.asarray(e, self.dtype)
                                         for e in negative_prompt_embeds)
                add_text = jnp.concatenate([uncond_pooled, pooled], 0)
            else:
                uncond = text_emb
                add_text = pooled
            return text_emb, uncond, add_text, int(text_emb.shape[0])
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompts)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * B
        text_emb, pooled = self.encode_prompt_xl(prompts)
        if use_cfg:
            uncond, uncond_pooled = self.encode_prompt_xl(
                list(negative_prompt))
            add_text = jnp.concatenate([uncond_pooled, pooled], 0)
        else:
            uncond = text_emb
            add_text = pooled
        return text_emb, uncond, add_text, B

    # -- sampling ------------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: Union[str, Sequence[str]] = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        height: int = 1024,
        width: int = 1024,
        rng: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        return_latents: bool = False,
        scheduler: str = "ddim",
        lora_idx: Optional[jax.Array] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        prompt_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
        negative_prompt_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
        output_type: str = "np",
    ):
        use_cfg = guidance_scale > 1.0
        text_emb, uncond, add_text, B = self._resolve_cond_xl(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        time_ids = self._time_ids(
            add_text.shape[0], height, width, original_size,
            crops_coords_top_left, target_size)
        if latents is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            latents = self.prepare_latents(B, height, width, rng)
        ts, sigmas = self._scheduler_arrays(scheduler, num_inference_steps)
        loop_method = {"euler_karras": "euler",
                       "euler_a_karras": "euler_a"}.get(scheduler, scheduler)
        if loop_method in ("euler", "euler_a"):
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
                                                               jnp.int32),
            add_text_embeds=add_text.astype(self.dtype),
            add_time_ids=time_ids)
        images = self._decode(latents, output_type)
        if return_latents:
            return images, latents
        return images

    def img2img(
        self,
        prompt: Union[str, Sequence[str]],
        init_image: jax.Array,  # (B,H,W,3) in [-1,1]
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Union[str, Sequence[str]] = "",
        rng: Optional[jax.Array] = None,
        lora_idx: Optional[jax.Array] = None,
        prompt_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
        negative_prompt_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
        output_type: str = "np",
    ):
        use_cfg = guidance_scale > 1.0
        text_emb, uncond, add_text, B = self._resolve_cond_xl(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        H, W = int(init_image.shape[1]), int(init_image.shape[2])
        self._check_size(H, W)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_enc, k_noise = jax.random.split(rng)
        z = _jit_vae_encode(self.vae_params, init_image.astype(self.dtype),
                            self.vae_cfg, k_enc)
        ts_all = schedulers.ddim_timesteps(self.schedule,
                                           num_inference_steps)
        t_start = max(
            num_inference_steps - int(num_inference_steps * strength), 0)
        ts = ts_all[t_start:]
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        z = schedulers.add_noise(self.schedule, z, noise,
                                 jnp.full((B,), int(ts[0]), jnp.int32))
        time_ids = self._time_ids(add_text.shape[0], H, W, None, (0, 0),
                                  None)
        latents = _denoise_loop(
            self.unet_params, self.lora_unet, z, text_emb, uncond,
            jnp.float32(guidance_scale), jnp.asarray(ts, jnp.int32),
            self.schedule.alphas_cumprod,
            jnp.float32(self.schedule.final_alpha_cumprod), self.unet_cfg,
            num_inference_steps, use_cfg,
            lora_idx=None if lora_idx is None else jnp.asarray(lora_idx,
                                                               jnp.int32),
            add_text_embeds=add_text.astype(self.dtype),
            add_time_ids=time_ids)
        return self._decode(latents, output_type)

    def inpaint(
        self,
        prompt: Union[str, Sequence[str]],
        image: jax.Array,        # (B,H,W,3) in [-1,1]
        mask: jax.Array,         # (B,H,W,1) in {0,1}; 1 = repaint
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Union[str, Sequence[str]] = "",
        rng: Optional[jax.Array] = None,
        scheduler: str = "ddim",
        lora_idx: Optional[jax.Array] = None,
        prompt_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
        negative_prompt_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
        output_type: str = "np",
    ):
        """SDXL latent-blend inpainting with the standard 4-channel
        checkpoint (pipelines/sd._denoise_loop blend channel — after each
        scheduler step the kept region is overwritten with the original
        latents renoised to the stepped-to level). There is no official
        9-channel SDXL base release the reference era covers, so the blend
        technique IS the XL inpainting path; kept-region preservation is
        exact in latent space. strength semantics match img2img."""
        from .sd import _latent_mask

        use_cfg = guidance_scale > 1.0
        text_emb, uncond, add_text, B = self._resolve_cond_xl(
            prompt, negative_prompt, use_cfg, prompt_embeds,
            negative_prompt_embeds)
        H, W = int(image.shape[1]), int(image.shape[2])
        self._check_size(H, W)
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
        time_ids = self._time_ids(add_text.shape[0], H, W, None, (0, 0),
                                  None)
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
            add_text_embeds=add_text.astype(self.dtype),
            add_time_ids=time_ids,
            blend_mask=mask_small, blend_z0=z0.astype(jnp.float32),
            blend_noise=noise0)
        return self._decode(latents, output_type)
