"""Regenerate tests/goldens/tiny_golden.npz after an INTENTIONAL numeric
change. Run from the repo root on CPU:
    python tests/goldens/regen.py
(Keep the seeds/shapes in sync with tests/test_goldens.py.)"""

import jax

jax.config.update("jax_platforms", "cpu")
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from lora_tpu.models.clip import clip_text_forward, init_clip_text
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.models.unet import init_unet, unet_forward
from lora_tpu.models.vae import init_vae, vae_decode, vae_encode
from lora_tpu.pipelines.sd import StableDiffusionPipeline

up = init_unet(TINY_UNET, jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
t = jnp.array([10, 500])
ctx = jax.random.normal(jax.random.PRNGKey(4),
                        (2, 7, TINY_UNET.cross_attention_dim))
unet_out = np.asarray(unet_forward(up, x, t, ctx, TINY_UNET))

tp = init_clip_text(TINY_TEXT, jax.random.PRNGKey(1))
clip_out = np.asarray(clip_text_forward(
    tp, jnp.array([[1, 5, 9, 2, 0, 0, 0]]), TINY_TEXT))

vp = init_vae(TINY_VAE, jax.random.PRNGKey(2))
img = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3)) * 0.5
z = vae_encode(vp, img, TINY_VAE, jax.random.PRNGKey(6))
dec = np.asarray(vae_decode(vp, z, TINY_VAE))

pipe = StableDiffusionPipeline.random_init(
    jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
    vae_cfg=TINY_VAE)
lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(7))
outs = {}
for sch in ("ddim", "pndm", "euler", "dpm++"):
    outs[f"pipe_{sch}"] = pipe("golden prompt", num_inference_steps=3,
                               height=64, width=64, latents=lat,
                               scheduler=sch)

np.savez_compressed("tests/goldens/tiny_golden.npz", unet=unet_out,
                    clip=clip_out, vae_dec=dec, z=np.asarray(z), **outs)
print("regenerated tests/goldens/tiny_golden.npz")
