"""End-to-end SDXL: DreamBooth-LoRA training, kohya-XL artifact, patch
back, render (beyond the reference — it predates SDXL; the SD1.5
counterpart of this flow is scripts/run_lora_db_unet_only.sh +
run_inference.ipynb).

Usage:
  python examples/sdxl_train_and_render.py --model /path/to/sdxl \
      --data ./instance_images --prompt "a photo of sks dog" --steps 800
  python examples/sdxl_train_and_render.py --tiny       # CPU smoke mode
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import jax


def load_xl_pipe(args):
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        from lora_tpu.models.config import (
            TINY_VAE,
            TINY_XL_TEXT,
            TINY_XL_TEXT2,
            TINY_XL_UNET,
        )

        return StableDiffusionXLPipeline.random_init(
            jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET,
            text_cfg=TINY_XL_TEXT, text2_cfg=TINY_XL_TEXT2,
            vae_cfg=TINY_VAE)
    if not args.model:
        raise SystemExit("--model is required (or pass --tiny)")
    return StableDiffusionXLPipeline.from_pretrained(args.model)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="SDXL pipeline dir")
    ap.add_argument("--tiny", action="store_true",
                    help="random-init tiny XL pipeline on CPU (smoke mode)")
    ap.add_argument("--data", default=None, help="instance image dir")
    ap.add_argument("--prompt", default="a photo of sks dog")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--train_text_encoder", action="store_true")
    ap.add_argument("--out", default="./exps/sdxl_demo")
    args = ap.parse_args()

    import numpy as np

    from lora_tpu.training.dreambooth import (
        DreamBoothConfig,
        train_dreambooth,
    )
    from lora_tpu.utils.eval import to_pil

    pipe = load_xl_pipe(args)
    size = 64 if args.tiny else 1024
    data = args.data
    if data is None:
        if not args.tiny:
            raise SystemExit("--data is required (or pass --tiny)")
        from PIL import Image

        data = os.path.join(args.out, "instance")
        os.makedirs(data, exist_ok=True)
        rs = np.random.RandomState(0)
        for i in range(2):
            Image.fromarray((rs.rand(size, size, 3) * 255).astype(
                np.uint8)).save(os.path.join(data, f"img{i}.jpg"))

    steps = 2 if args.tiny else args.steps
    cfg = DreamBoothConfig(
        instance_data_dir=data, output_dir=args.out,
        instance_prompt=args.prompt, resolution=size,
        lora_rank=2 if args.tiny else args.rank,
        max_train_steps=steps, save_steps=0,
        train_text_encoder=args.train_text_encoder or args.tiny,
        output_format="safe",  # SDXL artifacts are kohya-XL schema
        mixed_precision=None if args.tiny else "bf16",
        cached_latents=True, seed=0)
    res = train_dreambooth(pipe, cfg)
    print(f"trained {res['steps']} steps, final loss {res['final_loss']:.4f}")

    artifact = os.path.join(args.out, "lora_weight.safetensors")
    import dataclasses

    fresh = dataclasses.replace(pipe)
    fresh.patch_pipe(artifact)
    img = fresh(args.prompt, num_inference_steps=2 if args.tiny else 30,
                height=size if args.tiny else 1024,
                width=size if args.tiny else 1024,
                guidance_scale=5.0, rng=jax.random.PRNGKey(1))
    out_png = os.path.join(args.out, "render.png")
    to_pil(img[0]).save(out_png)
    print(f"saved {out_png} (patched from {artifact})")


if __name__ == "__main__":
    main()
