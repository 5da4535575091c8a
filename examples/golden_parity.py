"""Golden parity check — SURVEY §7.4's minimum end-to-end slice.

Given a local SD-1.5 diffusers directory, this loads the reference's
published artifact (example_loras/lora_disney.safetensors), patches the
pipeline, and renders the alpha sweep at fixed latents, writing a grid plus
per-alpha image stats. With a reference-image directory
(--reference_images, produced by the torch reference at matched seed), it
reports max pixel deltas (BASELINE target: <= 1e-3 at alpha=1).

Zero-egress environments without SD-1.5 weights can't run this; everything
it exercises is covered structurally by tests/ (format byte-exactness,
site-order parity, alpha-sweep continuity on random weights).

Usage:
  python examples/golden_parity.py --model /path/to/sd15 \
      --lora /root/reference/example_loras/lora_disney.safetensors \
      [--reference_images ./ref_pngs] [--out parity]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--lora",
                    default="/root/reference/example_loras/lora_disney.safetensors")
    ap.add_argument("--prompt", default="a <s1><s2> style town")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=7.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--alphas", default="0,0.5,1.0")
    ap.add_argument("--reference_images", default=None)
    ap.add_argument("--out", default="parity")
    args = ap.parse_args()

    import jax

    from lora_tpu.pipelines.sd import StableDiffusionPipeline
    from lora_tpu.utils.eval import image_grid, to_pil

    pipe = StableDiffusionPipeline.from_pretrained(args.model)
    tokens = pipe.patch_pipe(args.lora)
    print(f"patched; TI tokens: {sorted(tokens)}")

    latents = pipe.prepare_latents(1, 512, 512, jax.random.PRNGKey(args.seed))
    os.makedirs(args.out, exist_ok=True)
    report = {}
    frames = []
    for alpha in [float(a) for a in args.alphas.split(",")]:
        pipe.tune_lora_scale(alpha)
        img = pipe(args.prompt, num_inference_steps=args.steps,
                   guidance_scale=args.guidance, latents=latents)
        frames.append(to_pil(img[0]))
        frames[-1].save(os.path.join(args.out, f"alpha_{alpha}.png"))
        stats = {"mean": float(img.mean()), "std": float(img.std())}
        if args.reference_images:
            ref_path = os.path.join(args.reference_images,
                                    f"alpha_{alpha}.png")
            if os.path.exists(ref_path):
                from PIL import Image

                ref = np.asarray(Image.open(ref_path), np.float32) / 255.0
                stats["max_pixel_delta"] = float(
                    np.abs(ref - img[0]).max())
        report[str(alpha)] = stats
        print(alpha, stats)
    image_grid(frames, rows=1).save(os.path.join(args.out, "sweep.png"))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}/")


if __name__ == "__main__":
    main()
