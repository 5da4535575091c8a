"""DreamBooth-LoRA training CLI (reference train_lora_dreambooth.py).
`python -m lora_tpu.cli.lora_db --pretrained_model_name_or_path ... `"""

from __future__ import annotations


from ._fire import fire
from ..training.dreambooth import DreamBoothConfig, train_dreambooth


def train(pretrained_model_name_or_path: str = "",
          mixed_precision: str = None, **kwargs):
    import os

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if mixed_precision == "bf16" else jnp.float32
    # SDXL checkpoint dirs carry a second text encoder; train the XL way
    # (dual encoders, text_time conditioning, kohya-XL artifacts)
    if os.path.isdir(os.path.join(pretrained_model_name_or_path,
                                  "text_encoder_2")):
        from ..pipelines.sdxl import StableDiffusionXLPipeline as Pipe
    else:
        from ..pipelines.sd import StableDiffusionPipeline as Pipe
    pipe = Pipe.from_pretrained(pretrained_model_name_or_path, dtype=dtype)
    from ._fire import coerce_kwargs_to_dataclass

    kwargs = coerce_kwargs_to_dataclass(DreamBoothConfig, kwargs)
    cfg = DreamBoothConfig(mixed_precision=mixed_precision, **kwargs)
    return train_dreambooth(pipe, cfg)


def main():
    # join a lora_launch process group if one is configured
    from ..parallel.mesh import initialize_distributed_from_env

    initialize_distributed_from_env()
    fire(train)


if __name__ == "__main__":
    main()
