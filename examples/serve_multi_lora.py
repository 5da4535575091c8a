"""Multi-LoRA batched serving demo: K adapters, one compiled program,
per-request adapter routing — the TPU-native answer to running many
fine-tunes behind one endpoint.

Usage:
  python examples/serve_multi_lora.py --model /path/to/sd15 \
      --loras a.safetensors,b.safetensors,c.safetensors \
      --prompts "a dog|a cat|a house" --route 0,1,2 --out batch.png
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax


def main():
    from _common import add_pipe_args, load_pipe

    ap = argparse.ArgumentParser()
    add_pipe_args(ap)
    ap.add_argument("--loras", required=True, help="comma-separated files")
    ap.add_argument("--prompts", required=True, help="pipe-separated")
    ap.add_argument("--route", required=True,
                    help="comma-separated adapter index per prompt")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="multi_lora.png")
    args = ap.parse_args()

    from lora_tpu.core.lora import lora_from_flat, stack_loras
    from lora_tpu.formats.safetensors_io import load_safeloras
    from lora_tpu.utils.eval import image_grid, to_pil

    pipe = load_pipe(args)
    adapters = []
    for path in args.loras.split(","):
        w, ranks, target = load_safeloras(path)["unet"]
        adapters.append(lora_from_flat(w, pipe.unet_sites(set(target))))
    pipe.lora_unet = stack_loras(adapters)

    prompts = args.prompts.split("|")
    route = [int(i) for i in args.route.split(",")]
    assert len(prompts) == len(route)
    imgs = pipe(prompts, num_inference_steps=args.steps,
                rng=jax.random.PRNGKey(0), lora_idx=route,
                height=args.size, width=args.size)
    image_grid([to_pil(im) for im in imgs], rows=1).save(args.out)
    print(f"served {len(prompts)} prompts across {len(adapters)} adapters "
          f"in one batch -> {args.out}")


if __name__ == "__main__":
    main()
