"""Inpainting with a (optionally LoRA-patched) pipeline.

Routes by checkpoint: a 9-channel inpainting UNet
(runwayml/stable-diffusion-inpainting layout) goes through pipe.inpaint();
a plain 4-channel checkpoint — including any LoRA-patched base — uses
pipe.inpaint_blend(), the latent-blend technique (kept regions are exact
in latent space). The mask is a PNG: luma >= 128 marks the region to
repaint.

Usage:
  python examples/inpaint_lora.py --model /path/to/sd15 \
      --image photo.png --mask hole.png --prompt "a red door" \
      [--lora l.safetensors --alpha 0.8] [--scheduler dpm++]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def main():
    from _common import add_pipe_args, load_pipe

    ap = argparse.ArgumentParser()
    add_pipe_args(ap)
    ap.add_argument("--lora", default=None)
    ap.add_argument("--image", required=True)
    ap.add_argument("--mask", required=True,
                    help="PNG; luma >= 128 = repaint")
    ap.add_argument("--prompt", default="a photo")
    ap.add_argument("--strength", type=float, default=0.8,
                    help="blend path only; img2img semantics")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scheduler", default="ddim",
                    help="blend path only (9-channel samples with ddim)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="inpaint.png")
    args = ap.parse_args()

    from lora_tpu.utils.eval import to_pil

    pipe = load_pipe(args)
    if args.lora:
        pipe.patch_pipe(args.lora)
        pipe.tune_lora_scale(args.alpha)

    img = Image.open(args.image).convert("RGB").resize(
        (args.size, args.size))
    image = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    m = Image.open(args.mask).convert("L").resize(
        (args.size, args.size), Image.NEAREST)
    mask = jnp.asarray(
        (np.asarray(m, np.float32) >= 128.0).astype(np.float32))[None, ...,
                                                                 None]
    rng = jax.random.PRNGKey(args.seed)
    if pipe.unet_cfg.in_channels != pipe.unet_cfg.out_channels:
        out = pipe.inpaint(args.prompt, image, mask,
                           num_inference_steps=args.steps, rng=rng)
        path = "9-channel"
    else:
        out = pipe.inpaint_blend(args.prompt, image, mask,
                                 strength=args.strength,
                                 num_inference_steps=args.steps,
                                 scheduler=args.scheduler, rng=rng)
        path = "latent-blend"
    to_pil(out[0]).save(args.out)
    print(f"saved {args.out} ({path})")


if __name__ == "__main__":
    main()
