"""Training-progress visualization
(reference scripts/lora_training_process_visualized.ipynb): render one
prompt at a fixed seed across every saved checkpoint.

Usage:
  python examples/training_progress.py --model /path/to/sd15 \
      --checkpoints "out/step_*.safetensors" --prompt "a <s1><s2> thing"
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    from _common import add_pipe_args, load_pipe

    ap = argparse.ArgumentParser()
    add_pipe_args(ap)
    ap.add_argument("--checkpoints", required=True,
                    help="glob over step_*.safetensors")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="progress.png")
    args = ap.parse_args()

    from lora_tpu.utils.eval import image_grid, visualize_progress

    pipe = load_pipe(args)
    imgs = visualize_progress(args.checkpoints, args.prompt, pipe,
                              num_inference_steps=args.steps,
                              height=args.size, width=args.size)
    image_grid(imgs).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
