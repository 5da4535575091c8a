"""One-chip latency probe for the image-mode sampling surfaces.

Measures warm end-to-end latency (device-complete) of img2img and
latent-blend inpainting at 512px/30 steps/CFG 7.5 in bf16 — the serving
image modes' device cost — and prints one JSON line. Not part of the
driver's bench.py headline; run ad hoc to refresh the PERF.md row.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from lora_tpu.models.config import SD15_TEXT, SD15_UNET, SD15_VAE
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=SD15_UNET, text_cfg=SD15_TEXT,
        vae_cfg=SD15_VAE, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(1, 512, 512, 3).astype(np.float32) * 2 - 1)
    mask = np.zeros((1, 512, 512, 1), np.float32)
    mask[:, :, 256:] = 1.0
    mask = jnp.asarray(mask)
    rng = jax.random.PRNGKey(7)

    def timed(fn, n=3):
        """Chain each call's output into the next call's input — through
        the tunnel, independent identical calls over-report (dispatch
        pipelining), so only a data-dependent chain times real device
        work."""
        x = fn(image)  # compile
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x * 2.0 - 1.0)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / n

    t_i2i = timed(lambda img: pipe.img2img(
        "a probe", img, strength=0.8, num_inference_steps=30,
        guidance_scale=7.5, rng=rng, output_type="device"))
    t_blend = timed(lambda img: pipe.inpaint_blend(
        "a probe", img, mask, strength=0.8, num_inference_steps=30,
        guidance_scale=7.5, rng=rng, output_type="device"))
    print(json.dumps({
        "metric": "image_mode_latency_512px_30step_cfg_bf16",
        "img2img_s": round(t_i2i, 3),
        "inpaint_blend_s": round(t_blend, 3),
        "unit": "s (warm, chained, mean of 3)",
    }))


if __name__ == "__main__":
    main()
