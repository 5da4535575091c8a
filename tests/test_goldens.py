"""Self-golden numeric regression: tiny-config outputs at pinned seeds,
frozen in tests/goldens/tiny_golden.npz (regenerate with
tests/goldens/regen.py after an INTENTIONAL numeric change).

CPU lane only: the fixtures pin CPU arithmetic. On TPU, transcendental ops
(exp/rsqrt/sigmoid) round differently — the UNet forward lands ~2e-5 off,
within physics but outside these deliberately tight regression tolerances,
and DPM++2M's multistep eps extrapolation chaotically amplifies that with
random weights. Hardware numerics are covered by the cross-implementation
oracle tests (tests/test_torch_oracle.py) whose tolerances are physical,
and by the TPU kernel lane (test_flash_attention/test_lora_core)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() in ("tpu", "axon"):
    pytest.skip("CPU-pinned fixtures; see module docstring",
                allow_module_level=True)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "tiny_golden.npz")

from lora_tpu.models.clip import clip_text_forward, init_clip_text
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.models.unet import init_unet, unet_forward
from lora_tpu.models.vae import init_vae, vae_decode
from lora_tpu.pipelines.sd import StableDiffusionPipeline


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file not generated")
    return np.load(GOLDEN)


def test_unet_golden(golden):
    up = init_unet(TINY_UNET, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(4),
                            (2, 7, TINY_UNET.cross_attention_dim))
    out = np.asarray(unet_forward(up, x, t, ctx, TINY_UNET))
    np.testing.assert_allclose(out, golden["unet"], rtol=1e-4, atol=1e-5)


def test_clip_golden(golden):
    tp = init_clip_text(TINY_TEXT, jax.random.PRNGKey(1))
    ids = jnp.array([[1, 5, 9, 2, 0, 0, 0]])
    out = np.asarray(clip_text_forward(tp, ids, TINY_TEXT))
    np.testing.assert_allclose(out, golden["clip"], rtol=1e-4, atol=1e-5)


def test_vae_golden(golden):
    vp = init_vae(TINY_VAE, jax.random.PRNGKey(2))
    dec = np.asarray(vae_decode(vp, jnp.asarray(golden["z"]), TINY_VAE))
    np.testing.assert_allclose(dec, golden["vae_dec"], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sch", ["ddim", "pndm", "euler", "dpm++"])
def test_pipeline_golden(golden, sch):
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(7))
    out = pipe("golden prompt", num_inference_steps=3, height=64, width=64,
               latents=lat, scheduler=sch)
    np.testing.assert_allclose(out, golden[f"pipe_{sch}"], rtol=2e-4,
                               atol=2e-4)
