"""Subprocess worker for test_multiprocess.py.

Runs the REAL `train_dreambooth` under a genuine multi-process
`jax.distributed` runtime (Gloo collectives over localhost) with N virtual
CPU devices per process — the environment's stand-in for the reference's
`accelerate launch` DDP path (train_lora_dreambooth.py:489-494). Launched
as a plain script so each process owns its XLA device-count flag and
distributed initialization.
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--cached", action="store_true")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--sync-every", type=int, default=2)
    ap.add_argument("--resume", action="store_true",
                    help="resume from <out>/train_state.safetensors")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax

    # sitecustomize pins JAX_PLATFORMS; override in-process before first use
    jax.config.update("jax_platforms", "cpu")
    # share the CPU lane's persistent compile cache (tests/conftest.py):
    # without it every worker process pays the full ~170s train-step
    # compile, which used to dominate the multiprocess lane's wall clock
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if args.nproc > 1:
        jax.distributed.initialize(f"localhost:{args.port}",
                                   num_processes=args.nproc,
                                   process_id=args.pid)
    from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
    from lora_tpu.pipelines.sd import StableDiffusionPipeline
    from lora_tpu.training.dreambooth import (
        DreamBoothConfig,
        train_dreambooth,
    )

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    cfg = DreamBoothConfig(
        instance_data_dir=os.path.join(args.data, "inst"),
        # SHARED output dir: only process 0 may write artifacts (the
        # is_main_process gating under test)
        output_dir=args.out,
        instance_prompt="a photo of sks thing",
        with_prior_preservation=True,
        class_data_dir=os.path.join(args.data, "cls"),
        class_prompt="a photo of thing",
        num_class_images=2,
        prior_loss_weight=1.0,
        resolution=64,
        lora_rank=2,
        max_train_steps=args.steps,
        preemption_sync_every=args.sync_every,
        save_steps=100,
        train_batch_size=1,   # per-chip; global = 1 x dp
        data_parallel=True,
        fsdp=args.fsdp,
        cached_latents=args.cached,
        seed=0,
        save_train_state=True,
        resume_state=(os.path.join(args.out, "train_state.safetensors")
                      if args.resume else None),
    )
    res = train_dreambooth(pipe, cfg)
    print("RESULT " + json.dumps({
        "pid": args.pid,
        "loss": float(res["final_loss"]),
        "steps": int(res["steps"]),
        "preempted": bool(res.get("preempted", False)),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
