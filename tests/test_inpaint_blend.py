"""Latent-blend inpainting (pipelines/sd.inpaint_blend, sdxl.inpaint).

The technique (diffusers legacy / A1111 for plain 4-channel checkpoints):
after every scheduler step the kept region is overwritten with the
original latents renoised to the stepped-to level, so only the masked
region is resampled and kept-region preservation is EXACT in latent
space — the properties pinned here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import (
    StableDiffusionPipeline,
    _denoise_loop,
    _jit_vae_encode,
)


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)


def _image_and_masks(B=1, H=64, W=64):
    rs = np.random.RandomState(11)
    image = jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32) * 2 - 1)
    half = np.zeros((B, H, W, 1), np.float32)
    half[:, :, W // 2:] = 1.0  # repaint the right half
    return image, jnp.asarray(half)


def test_blend_loop_kept_region_exact_repainted_moves(pipe):
    """Driving the loop directly: blend_mask==0 latents come out EXACTLY
    blend_z0 (the final step blends z0 itself); masked latents move."""
    rs = np.random.RandomState(3)
    B, h, w, C = 1, 8, 8, TINY_UNET.out_channels
    z0 = jnp.asarray(rs.randn(B, h, w, C).astype(np.float32))
    noise0 = jnp.asarray(rs.randn(B, h, w, C).astype(np.float32))
    mask = np.zeros((B, h, w, 1), np.float32)
    mask[:, :, w // 2:] = 1.0
    mask = jnp.asarray(mask)
    steps = 3
    # the real ddim grid ([667, 334, 1] at 3 steps): its final stepped-to
    # timestep is negative, which is what makes the last blend use z0 itself
    from lora_tpu.models import schedulers as _sched
    ts = jnp.asarray(_sched.ddim_timesteps(pipe.schedule, steps), jnp.int32)
    emb = pipe.encode_prompt(["x"])
    start = pipe.schedule.alphas_cumprod[ts[0]]
    lat0 = (jnp.sqrt(start) * z0 + jnp.sqrt(1 - start) * noise0)
    out = _denoise_loop(
        pipe.unet_params, None, lat0, emb, emb, jnp.float32(1.0), ts,
        pipe.schedule.alphas_cumprod,
        jnp.float32(pipe.schedule.final_alpha_cumprod), pipe.unet_cfg,
        steps, False, blend_mask=mask, blend_z0=z0, blend_noise=noise0)
    kept = np.asarray(out)[:, :, : w // 2]
    np.testing.assert_allclose(kept, np.asarray(z0)[:, :, : w // 2],
                               atol=1e-6)
    moved = np.abs(np.asarray(out)[:, :, w // 2:]
                   - np.asarray(z0)[:, :, w // 2:]).max()
    assert moved > 1e-3


@pytest.mark.parametrize("scheduler", ["ddim", "euler", "euler_a", "dpm++",
                                       "euler_karras"])
def test_inpaint_blend_keep_all_is_vae_roundtrip(pipe, scheduler):
    """mask == 0 everywhere: every step blends the full frame back, so the
    output is exactly decode(encode(image)) — for every supported
    scheduler, including the sigma-space (euler) blend."""
    image, _ = _image_and_masks()
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32)
    rng = jax.random.PRNGKey(5)
    out = pipe.inpaint_blend("a dog", image, mask, strength=0.8,
                             num_inference_steps=3, guidance_scale=1.0,
                             rng=rng, scheduler=scheduler)
    k_enc, _ = jax.random.split(rng)
    z0 = _jit_vae_encode(pipe.vae_params, image.astype(pipe.dtype),
                         pipe.vae_cfg, k_enc)
    expect = pipe._decode(z0)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_inpaint_blend_half_mask_runs_and_differs(pipe):
    image, mask = _image_and_masks()
    out = pipe.inpaint_blend("a dog", image, mask, strength=1.0,
                             num_inference_steps=3, guidance_scale=7.5,
                             rng=jax.random.PRNGKey(5))
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()
    rng = jax.random.PRNGKey(5)
    k_enc, _ = jax.random.split(rng)
    z0 = _jit_vae_encode(pipe.vae_params, image.astype(pipe.dtype),
                         pipe.vae_cfg, k_enc)
    roundtrip = pipe._decode(z0)
    # the repainted half moved; the kept half is exact in latent space so
    # pixel deviation appears only via decode bleed across the boundary
    assert np.abs(out[:, :, 32:] - roundtrip[:, :, 32:]).max() > 1e-3


def test_inpaint_blend_rejections(pipe):
    image, mask = _image_and_masks()
    with pytest.raises(ValueError, match="pndm"):
        pipe.inpaint_blend("x", image, mask, num_inference_steps=3,
                           scheduler="pndm")
    with pytest.raises(ValueError, match="strength"):
        pipe.inpaint_blend("x", image, mask, strength=0.0,
                           num_inference_steps=3)


def test_xl_inpaint_keep_all_is_vae_roundtrip():
    from lora_tpu.models.config import (
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    image, half = _image_and_masks()
    rng = jax.random.PRNGKey(5)
    out = pipe.inpaint("a dog", image, jnp.zeros((1, 64, 64, 1)),
                       strength=0.8, num_inference_steps=2,
                       guidance_scale=1.0, rng=rng)
    k_enc, _ = jax.random.split(rng)
    z0 = _jit_vae_encode(pipe.vae_params, image.astype(pipe.dtype),
                         pipe.vae_cfg, k_enc)
    np.testing.assert_allclose(out, pipe._decode(z0), atol=1e-5)
    # half mask runs with CFG + micro-conditioning and stays finite
    out2 = pipe.inpaint("a dog", image, half, num_inference_steps=2,
                        guidance_scale=5.0, rng=rng)
    assert out2.shape == (1, 64, 64, 3) and np.isfinite(out2).all()


def test_prompt_embeds_passthrough_matches_prompt_path(pipe):
    """img2img / inpaint_blend with precomputed prompt_embeds (the serving
    embed cache's passthrough) are bit-identical to the prompt-string
    path."""
    image, mask = _image_and_masks()
    rng = jax.random.PRNGKey(4)
    emb = pipe.encode_prompt(["a dog"])
    neg = pipe.encode_prompt([""])
    a = pipe.img2img("a dog", image, strength=1.0, num_inference_steps=3,
                     guidance_scale=7.5, rng=rng)
    b = pipe.img2img(None, image, strength=1.0, num_inference_steps=3,
                     guidance_scale=7.5, rng=rng, prompt_embeds=emb,
                     negative_prompt_embeds=neg)
    np.testing.assert_array_equal(a, b)
    a = pipe.inpaint_blend("a dog", image, mask, strength=1.0,
                           num_inference_steps=3, guidance_scale=7.5,
                           rng=rng, scheduler="euler")
    b = pipe.inpaint_blend(None, image, mask, strength=1.0,
                           num_inference_steps=3, guidance_scale=7.5,
                           rng=rng, scheduler="euler", prompt_embeds=emb,
                           negative_prompt_embeds=neg)
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="negative_prompt_embeds"):
        pipe.inpaint_blend(None, image, mask, num_inference_steps=3,
                           guidance_scale=7.5, prompt_embeds=emb)


def test_xl_inpaint_prompt_embeds_passthrough():
    from lora_tpu.models.config import (
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    image, mask = _image_and_masks()
    rng = jax.random.PRNGKey(4)
    emb = pipe.encode_prompt_xl(["a dog"])
    neg = pipe.encode_prompt_xl([""])
    a = pipe.inpaint("a dog", image, mask, num_inference_steps=2,
                     guidance_scale=5.0, rng=rng)
    b = pipe.inpaint(None, image, mask, num_inference_steps=2,
                     guidance_scale=5.0, rng=rng, prompt_embeds=emb,
                     negative_prompt_embeds=neg)
    np.testing.assert_array_equal(a, b)
    a = pipe.img2img("a dog", image, strength=1.0, num_inference_steps=2,
                     guidance_scale=5.0, rng=rng)
    b = pipe.img2img(None, image, strength=1.0, num_inference_steps=2,
                     guidance_scale=5.0, rng=rng, prompt_embeds=emb,
                     negative_prompt_embeds=neg)
    np.testing.assert_array_equal(a, b)
