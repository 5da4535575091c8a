"""Alpha-sweep demo (reference scripts/make_alpha_gifs.ipynb): render the
same prompt/latents across tune_lora_scale values — the scale is a traced
scalar, so the sweep reuses one compiled program.

Usage:
  python examples/alpha_sweep.py --model /path/to/sd15 \
      --lora /path/to/lora.safetensors --prompt "superman" --out sweep.png
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    from _common import add_pipe_args, load_pipe

    ap = argparse.ArgumentParser()
    add_pipe_args(ap)
    ap.add_argument("--lora", required=True)
    ap.add_argument("--prompt", default="a photo")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=7.0)
    ap.add_argument("--alphas", default="0,0.25,0.5,0.75,1.0")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="alpha_sweep.png")
    args = ap.parse_args()

    from lora_tpu.utils.eval import image_grid, to_pil

    pipe = load_pipe(args)
    pipe.patch_pipe(args.lora)
    latents = pipe.prepare_latents(1, args.size, args.size,
                                   jax.random.PRNGKey(args.seed))

    frames = []
    for alpha in [float(a) for a in args.alphas.split(",")]:
        pipe.tune_lora_scale(alpha)
        img = pipe(args.prompt, num_inference_steps=args.steps,
                   guidance_scale=args.guidance, latents=latents,
                   height=args.size, width=args.size)
        frames.append(to_pil(img[0]))
        print(f"alpha={alpha} done")
    image_grid(frames, rows=1).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
