"""Shared CLI plumbing for the example scripts.

Every example accepts either a real SD pipeline (--model) or --tiny, which
random-inits the CPU unit-test configuration — the same tiny-config switch
the trainers' tests use — so the demos can be executed end to end by the
test suite (tests/test_examples.py) without weights or a TPU.
"""


def add_pipe_args(ap):
    ap.add_argument("--model", default=None,
                    help="SD pipeline dir (omit with --tiny)")
    ap.add_argument("--tiny", action="store_true",
                    help="random-init tiny pipeline on CPU (smoke mode)")
    ap.add_argument("--size", type=int, default=512,
                    help="image height/width")


def load_pipe(args):
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE

        return StableDiffusionPipeline.random_init(
            jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
            vae_cfg=TINY_VAE)
    if not args.model:
        raise SystemExit("--model is required (or pass --tiny)")
    return StableDiffusionPipeline.from_pretrained(args.model)
