"""`lora_pti` — pivotal tuning inversion CLI (reference cli_lora_pti.py).
Same flag surface as the reference recipes (multivector_example.sh,
use_face_conditioning_example.sh, inpainting_example.sh)."""

from __future__ import annotations


from ._fire import fire
from ..training.pti import PTIConfig, train_pti


def train(pretrained_model_name_or_path: str = "", device: str = "tpu",
          mixed_precision: str = None, **kwargs):
    del device
    import jax.numpy as jnp

    from ..pipelines.sd import StableDiffusionPipeline

    dtype = jnp.bfloat16 if mixed_precision == "bf16" else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(
        pretrained_model_name_or_path, dtype=dtype)
    from ._fire import coerce_kwargs_to_dataclass

    kwargs = coerce_kwargs_to_dataclass(PTIConfig, kwargs)
    cfg = PTIConfig(mixed_precision=mixed_precision, **kwargs)
    return train_pti(pipe, cfg)


def main():
    # join a lora_launch process group if one is configured
    from ..parallel.mesh import initialize_distributed_from_env

    initialize_distributed_from_env()
    fire(train)


if __name__ == "__main__":
    main()
