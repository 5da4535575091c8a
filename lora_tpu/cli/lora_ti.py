"""Legacy TI+LoRA trainer CLI (reference training_scripts/train_lora_w_ti.py
and train_lora_pt_caption.py; recipe run_lorpt.sh)."""

from __future__ import annotations

from ._fire import coerce_kwargs_to_dataclass, fire
from ..training.ti_legacy import LegacyTiConfig, train_ti_lora_legacy


def train(pretrained_model_name_or_path: str = "",
          mixed_precision: str = None, **kwargs):
    import jax.numpy as jnp

    from ..pipelines.sd import StableDiffusionPipeline

    dtype = jnp.bfloat16 if mixed_precision == "bf16" else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(
        pretrained_model_name_or_path, dtype=dtype)
    kwargs = coerce_kwargs_to_dataclass(LegacyTiConfig, kwargs)
    cfg = LegacyTiConfig(mixed_precision=mixed_precision, **kwargs)
    return train_ti_lora_legacy(pipe, cfg)


def main():
    # join a lora_launch process group if one is configured
    from ..parallel.mesh import initialize_distributed_from_env

    initialize_distributed_from_env()
    fire(train)


if __name__ == "__main__":
    main()
