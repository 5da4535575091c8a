"""img2img with a patched LoRA pipeline and per-tower alpha
(reference scripts/run_img2img.ipynb).

Usage:
  python examples/img2img_lora.py --model /path/to/sd15 --lora l.safetensors \
      --image init.png --prompt "..." --alpha_unet 0.8 --alpha_text 0.5
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
    ap.add_argument("--lora", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="a photo")
    ap.add_argument("--strength", type=float, default=0.7)
    ap.add_argument("--alpha_unet", type=float, default=1.0)
    ap.add_argument("--alpha_text", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="img2img.png")
    args = ap.parse_args()

    from lora_tpu.utils.eval import to_pil

    pipe = load_pipe(args)
    pipe.patch_pipe(args.lora)
    pipe.tune_lora_scale(args.alpha_unet, text_alpha=args.alpha_text)

    img = Image.open(args.image).convert("RGB").resize(
        (args.size, args.size))
    init = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    out = pipe.img2img(args.prompt, init, strength=args.strength,
                       num_inference_steps=args.steps,
                       rng=jax.random.PRNGKey(0))
    to_pil(out[0]).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
