"""End-to-end pipeline: txt2img sampling, patch_pipe, alpha sweep, TI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import init_lora, lora_to_pairs
from lora_tpu.formats.safetensors_io import (
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    save_safeloras_with_embeds,
)
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import StableDiffusionPipeline


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)


def rand_lora_file(pipe, tmp_path, with_ti=True, seed=0):
    usites = pipe.unet_sites()
    tsites = pipe.text_sites()
    ul = init_lora(usites, r=2, rng=jax.random.PRNGKey(seed))
    tl = init_lora(tsites, r=2, rng=jax.random.PRNGKey(seed + 1))
    ks = jax.random.split(jax.random.PRNGKey(seed + 2), len(ul["sites"]))
    for (n, e), k in zip(sorted(ul["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.05
    embeds = {}
    if with_ti:
        embeds = {"<s1>": np.random.RandomState(seed).randn(
            TINY_TEXT.hidden_size).astype(np.float32)}
    path = str(tmp_path / f"lora{seed}.safetensors")
    save_safeloras_with_embeds(
        {"unet": (lora_to_pairs(ul, usites), UNET_DEFAULT_TARGET_REPLACE),
         "text_encoder": (lora_to_pairs(tl, tsites),
                          TEXT_ENCODER_DEFAULT_TARGET_REPLACE)},
        embeds, path)
    return path


def test_rejects_sizes_that_break_the_unet(pipe):
    """Sizes that can't survive the UNet's stride-2 down/up round trip must
    fail loudly at the API edge, not as a concat shape error mid-forward."""
    with pytest.raises(ValueError, match="multiples of 64"):
        pipe("x", num_inference_steps=1, height=32, width=32)
    with pytest.raises(ValueError, match="multiples of 64"):
        pipe.img2img("x", jnp.zeros((1, 96, 96, 3), jnp.float32))


def test_txt2img_runs(pipe):
    img = pipe("a photo of a dog", num_inference_steps=3, height=64, width=64,
               guidance_scale=7.5, rng=jax.random.PRNGKey(1))
    assert img.shape == (1, 64, 64, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert np.isfinite(img).all()


def test_txt2img_device_output(pipe):
    """output_type='device' keeps images in device memory (serving paths
    that encode/forward elsewhere skip the host copy) with identical
    values."""
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(3))
    dev = pipe("a dog", num_inference_steps=2, height=64, width=64,
               latents=lat, output_type="device")
    host = pipe("a dog", num_inference_steps=2, height=64, width=64,
                latents=lat)
    assert isinstance(dev, jax.Array) and isinstance(host, np.ndarray)
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_txt2img_deterministic_given_latents(pipe):
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(7))
    a = pipe("a dog", num_inference_steps=2, height=64, width=64, latents=lat)
    b = pipe("a dog", num_inference_steps=2, height=64, width=64, latents=lat)
    np.testing.assert_array_equal(a, b)


def test_patch_pipe_and_alpha_sweep(pipe, tmp_path):
    path = rand_lora_file(pipe, tmp_path)
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(3))
    base = pipe("hello", num_inference_steps=2, height=64, width=64,
                latents=lat)
    embeds = pipe.patch_pipe(path)
    assert "<s1>" in embeds
    assert pipe.lora_unet is not None and pipe.lora_text is not None

    # alpha=0 must reproduce the unpatched image exactly
    pipe.tune_lora_scale(0.0)
    zero = pipe("hello", num_inference_steps=2, height=64, width=64,
                latents=lat)
    np.testing.assert_allclose(zero, base, atol=1e-5)

    # alpha=1 must differ
    pipe.tune_lora_scale(1.0)
    one = pipe("hello", num_inference_steps=2, height=64, width=64,
               latents=lat)
    assert np.abs(one - base).max() > 1e-4

    # remove restores base behavior
    pipe.remove_lora()
    removed = pipe("hello", num_inference_steps=2, height=64, width=64,
                   latents=lat)
    np.testing.assert_allclose(removed, base, atol=1e-6)


def test_collapse_matches_runtime(pipe, tmp_path):
    import dataclasses

    path = rand_lora_file(pipe, tmp_path, with_ti=False, seed=5)
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(4))
    p2 = dataclasses.replace(pipe)
    p2.patch_pipe(path, patch_ti=False)
    runtime = p2("x y", num_inference_steps=2, height=64, width=64,
                 latents=lat)
    p2.collapse_lora(alpha=1.0)
    assert p2.lora_unet is None
    collapsed = p2("x y", num_inference_steps=2, height=64, width=64,
                   latents=lat)
    np.testing.assert_allclose(runtime, collapsed, rtol=2e-2, atol=2e-3)


def test_ti_token_changes_output(pipe, tmp_path):
    import dataclasses

    from lora_tpu.data.tokenizer import CLIPTokenizer

    p2 = dataclasses.replace(pipe)
    p2.tokenizer = CLIPTokenizer(vocab_size=TINY_TEXT.vocab_size)
    path = rand_lora_file(p2, tmp_path, seed=9)
    lat = p2.prepare_latents(1, 64, 64, jax.random.PRNGKey(5))
    before_ids = p2.tokenizer("<s1>")["input_ids"][0]
    p2.patch_pipe(path)
    after_ids = p2.tokenizer("<s1>")["input_ids"][0]
    assert before_ids != after_ids  # token became atomic with its own id
    img_tok = p2("a <s1> photo", num_inference_steps=2, height=64, width=64,
                 latents=lat)
    img_plain = p2("a photo", num_inference_steps=2, height=64, width=64,
                   latents=lat)
    assert np.abs(img_tok - img_plain).max() > 1e-5


def test_alternate_schedulers_run(pipe):
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(11))
    a = pipe("x", num_inference_steps=3, height=64, width=64, latents=lat,
             scheduler="pndm")
    b = pipe("x", num_inference_steps=3, height=64, width=64, latents=lat,
             scheduler="euler")
    c = pipe("x", num_inference_steps=3, height=64, width=64, latents=lat,
             scheduler="ddim")
    d = pipe("x", num_inference_steps=3, height=64, width=64, latents=lat,
             scheduler="dpm++")
    e = pipe("x", num_inference_steps=3, height=64, width=64, latents=lat,
             scheduler="euler_a", rng=jax.random.PRNGKey(0))
    assert np.isfinite(e).all()
    for img in (a, b, c, d):
        assert img.shape == (1, 64, 64, 3) and np.isfinite(img).all()
    # different samplers produce different (but close-family) outputs
    assert np.abs(a - c).max() > 1e-6
    assert np.abs(b - c).max() > 1e-6
    assert np.abs(d - c).max() > 1e-6


def test_img2img_runs(pipe):
    init = jnp.zeros((1, 64, 64, 3)) + 0.1
    out = pipe.img2img("a cat", init, strength=0.5, num_inference_steps=4,
                       rng=jax.random.PRNGKey(6))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
