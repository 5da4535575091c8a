"""Multi-LoRA batched serving: per-sample adapter routing in one program."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import (
    init_lora,
    lora_delta_dense,
    stack_loras,
    with_lora_idx,
)
from lora_tpu.core.sites import Site, unet_lora_sites
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import StableDiffusionPipeline

SITES = [Site("a.to_q", "linear", 16, 16)]


def rand_lora(seed, r=2, sites=SITES):
    lora = init_lora(sites, r=r, rng=jax.random.PRNGKey(seed))
    ks = jax.random.split(jax.random.PRNGKey(seed + 50), len(lora["sites"]))
    for (n, e), k in zip(sorted(lora["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.1
    return lora


def test_routed_delta_matches_individual():
    l0, l1, l2 = rand_lora(0), rand_lora(1), rand_lora(2)
    stacked = stack_loras([l0, l1, l2])
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 16))
    idx = jnp.array([2, 0, 1, 0])
    d = lora_delta_dense(x, stacked["sites"]["a.to_q"], stacked["scale"],
                         idx=idx)
    for b, l in zip(range(4), (l2, l0, l1, l0)):
        ref = lora_delta_dense(x[b:b + 1], l["sites"]["a.to_q"], l["scale"])
        np.testing.assert_allclose(np.asarray(d[b:b + 1]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_routed_delta_respects_per_lora_scale():
    l0, l1 = rand_lora(3), rand_lora(4)
    from lora_tpu.core.lora import tune_lora_scale

    stacked = stack_loras([tune_lora_scale(l0, 0.5), tune_lora_scale(l1, 2.0)])
    x = jnp.ones((2, 16))
    d = lora_delta_dense(x, stacked["sites"]["a.to_q"], stacked["scale"],
                         idx=jnp.array([0, 1]))
    r0 = lora_delta_dense(x[:1], l0["sites"]["a.to_q"], jnp.float32(0.5))
    r1 = lora_delta_dense(x[1:], l1["sites"]["a.to_q"], jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(d[0]), np.asarray(r0[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d[1]), np.asarray(r1[0]), rtol=1e-5)


def test_stack_validation():
    with pytest.raises(ValueError):
        stack_loras([rand_lora(0, r=2), rand_lora(1, r=3)])  # rank mismatch
    # conv sites stack too (routed via the grouped-conv path)
    conv_sites = [Site("c.conv1", "conv", 8, 8, kernel=(3, 3))]
    stacked = stack_loras(
        [init_lora(conv_sites, r=2, rng=jax.random.PRNGKey(0)),
         init_lora(conv_sites, r=2, rng=jax.random.PRNGKey(1))])
    assert stacked["sites"]["c.conv1"]["down"].shape == (2, 2, 8, 3, 3)


def test_pipeline_batched_serving_matches_individual():
    """Batch of 2 prompts, each routed to a different adapter, equals two
    single-LoRA runs."""
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    usites = unet_lora_sites(TINY_UNET)
    la = rand_lora(10, sites=usites)
    lb = rand_lora(11, sites=usites)
    lat1 = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(5))
    lat = jnp.concatenate([lat1, lat1])

    batched = dataclasses.replace(pipe)
    batched.lora_unet = stack_loras([la, lb])
    out = batched(["p", "p"], num_inference_steps=2, height=64, width=64,
                  latents=lat, lora_idx=[0, 1])

    ref = []
    for l in (la, lb):
        single = dataclasses.replace(pipe)
        single.lora_unet = l
        ref.append(single("p", num_inference_steps=2, height=64, width=64,
                          latents=lat1))
    np.testing.assert_allclose(out[0], ref[0][0], rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(out[1], ref[1][0], rtol=2e-2, atol=2e-3)
    # and the two samples genuinely differ (different adapters)
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_routed_conv_delta_matches_individual():
    """Per-sample routed CONV LoRA (grouped-conv trick) == applying each
    adapter separately — extended-target adapters (resnet convs) are now
    batch-servable."""
    from lora_tpu.core.lora import lora_delta_conv

    conv_sites = [Site("res.conv1", "conv", 8, 12, kernel=(3, 3),
                       stride=(1, 1), padding=(1, 1))]
    loras = [rand_lora(s, sites=conv_sites) for s in (10, 11, 12)]
    stacked = stack_loras(loras)
    x = jax.random.normal(jax.random.PRNGKey(13), (4, 6, 6, 8))
    idx = jnp.array([1, 2, 0, 1])
    d = lora_delta_conv(x, stacked["sites"]["res.conv1"], stacked["scale"],
                        stride=(1, 1), padding=(1, 1), idx=idx)
    assert d.shape == (4, 6, 6, 12)
    for b, l in zip(range(4), (loras[1], loras[2], loras[0], loras[1])):
        ref = lora_delta_conv(x[b:b + 1], l["sites"]["res.conv1"], l["scale"],
                              stride=(1, 1), padding=(1, 1))
        np.testing.assert_allclose(np.asarray(d[b:b + 1]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_routed_conv_delta_strided():
    from lora_tpu.core.lora import lora_delta_conv

    conv_sites = [Site("down.conv", "conv", 8, 8, kernel=(3, 3),
                       stride=(2, 2), padding=(1, 1))]
    loras = [rand_lora(s, sites=conv_sites) for s in (20, 21)]
    stacked = stack_loras(loras)
    x = jax.random.normal(jax.random.PRNGKey(23), (2, 8, 8, 8))
    d = lora_delta_conv(x, stacked["sites"]["down.conv"], stacked["scale"],
                        stride=(2, 2), padding=(1, 1), idx=jnp.array([1, 0]))
    assert d.shape == (2, 4, 4, 8)
    for b, l in zip(range(2), (loras[1], loras[0])):
        ref = lora_delta_conv(x[b:b + 1], l["sites"]["down.conv"], l["scale"],
                              stride=(2, 2), padding=(1, 1))
        np.testing.assert_allclose(np.asarray(d[b:b + 1]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_batched_serving_extended_adapters():
    """Extended-target adapters (incl. resnet CONV sites) routed per sample
    through the full pipeline."""
    from lora_tpu.formats.safetensors_io import UNET_EXTENDED_TARGET_REPLACE

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    usites = unet_lora_sites(TINY_UNET, UNET_EXTENDED_TARGET_REPLACE)
    la, lb = rand_lora(30, sites=usites), rand_lora(31, sites=usites)
    lat1 = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(6))
    lat = jnp.concatenate([lat1, lat1])

    batched = dataclasses.replace(pipe)
    batched.lora_unet = stack_loras([la, lb])
    out = batched(["p", "p"], num_inference_steps=2, height=64, width=64,
                  latents=lat, lora_idx=[0, 1])

    single = dataclasses.replace(pipe)
    single.lora_unet = lb
    ref = single("p", num_inference_steps=2, height=64, width=64,
                 latents=lat1)
    np.testing.assert_allclose(out[1], ref[0], rtol=2e-2, atol=2e-3)
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_img2img_and_blend_respect_lora_idx():
    """Per-sample adapter routing holds through the image-mode surfaces:
    with identical image rows and a fixed rng, changing only row 1's
    adapter index changes only row 1 (the batch-shaped noise draws make a
    batched-vs-single comparison ill-posed, so routing is pinned within
    one batch shape instead)."""
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    usites = unet_lora_sites(TINY_UNET)
    batched = dataclasses.replace(pipe)
    batched.lora_unet = stack_loras([rand_lora(10, sites=usites),
                                     rand_lora(11, sites=usites)])
    rs = np.random.RandomState(1)
    img1 = rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    image = jnp.asarray(np.concatenate([img1, img1]))
    rng = jax.random.PRNGKey(5)

    a = batched.img2img(["p", "p"], image, strength=1.0,
                        num_inference_steps=2, guidance_scale=1.0, rng=rng,
                        lora_idx=[0, 1])
    c = batched.img2img(["p", "p"], image, strength=1.0,
                        num_inference_steps=2, guidance_scale=1.0, rng=rng,
                        lora_idx=[0, 0])
    np.testing.assert_array_equal(a[0], c[0])      # row 0 untouched
    assert np.abs(a[1] - c[1]).max() > 1e-4        # row 1 re-routed

    mask = np.zeros((2, 64, 64, 1), np.float32)
    mask[:, :, 32:] = 1.0
    mask = jnp.asarray(mask)
    a = batched.inpaint_blend(["p", "p"], image, mask, strength=1.0,
                              num_inference_steps=2, guidance_scale=1.0,
                              rng=rng, lora_idx=[0, 1])
    c = batched.inpaint_blend(["p", "p"], image, mask, strength=1.0,
                              num_inference_steps=2, guidance_scale=1.0,
                              rng=rng, lora_idx=[0, 0])
    np.testing.assert_array_equal(a[0], c[0])
    assert np.abs(a[1] - c[1]).max() > 1e-4
