"""LoRA merging + runtime mixing demo
(reference scripts/merge_lora_with_lora.ipynb): lpl weighted merge of two
LoRAs, then dynamic add_lora mixing at inference.

Usage:
  python examples/merge_and_mix.py --model /path/to/sd15 \
      --lora_a a.safetensors --lora_b b.safetensors --prompt "..."
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax


def main():
    from _common import add_pipe_args, load_pipe

    ap = argparse.ArgumentParser()
    add_pipe_args(ap)
    ap.add_argument("--lora_a", required=True)
    ap.add_argument("--lora_b", required=True)
    ap.add_argument("--prompt", default="a photo")
    ap.add_argument("--mix", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="mix.png")
    args = ap.parse_args()

    from lora_tpu.core.lora import add_lora, lora_from_flat
    from lora_tpu.formats.safetensors_io import load_safeloras
    from lora_tpu.utils.eval import image_grid, to_pil

    pipe = load_pipe(args)
    pipe.patch_pipe(args.lora_a)

    loras_b = load_safeloras(args.lora_b)
    w, ranks, target = loras_b["unet"]
    lora_b = lora_from_flat(w, pipe.unet_sites(set(target)))

    latents = pipe.prepare_latents(1, args.size, args.size,
                                   jax.random.PRNGKey(0))
    frames = []
    for mix in (0.0, args.mix, 1.0):
        # monkeypatch_add_lora equivalent: alpha*incoming + beta*existing
        pipe_mixed = pipe
        pipe_mixed.lora_unet = add_lora(pipe.lora_unet, lora_b,
                                        alpha=mix, beta=1.0 - mix)
        img = pipe_mixed(args.prompt, num_inference_steps=args.steps,
                         latents=latents, height=args.size, width=args.size)
        frames.append(to_pil(img[0]))
        print(f"mix={mix} done")
    image_grid(frames, rows=1).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
