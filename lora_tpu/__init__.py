"""lora_tpu — a TPU-native (JAX/XLA/Pallas) LoRA fine-tuning framework for
Stable Diffusion, with the full capability surface of cloneofsimo/lora:
LoRA injection/merging/joining/collapsing, pivotal tuning inversion,
DreamBooth training, SVD distillation, and bit-compatible safetensors
interop — redesigned as pure-functional pytree transforms over jitted
models instead of torch module surgery.
"""

__version__ = "0.1.0"

from .formats.safetensors_io import (  # noqa: F401
    DEFAULT_TARGET_REPLACE,
    EMBED_FLAG,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    TEXT_ENCODER_EXTENDED_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    UNET_EXTENDED_TARGET_REPLACE,
    load_safeloras,
    load_safeloras_both,
    load_safeloras_embeds,
    parse_safeloras,
    parse_safeloras_embeds,
    save_safeloras,
    save_safeloras_with_embeds,
)
from .core.lora import (  # noqa: F401
    add_lora,
    collapse_lora,
    init_lora,
    inspect_lora,
    join_loras,
    lora_from_flat,
    lora_from_pairs,
    lora_to_pairs,
    merge_loras,
    set_lora_diag,
    tune_lora_scale,
)
from .core.sites import (  # noqa: F401
    Site,
    text_encoder_locon_sites,
    text_encoder_lora_sites,
    unet_locon_sites,
    unet_lora_sites,
)


def __getattr__(name):
    # heavy imports stay lazy so `import lora_tpu` is cheap
    if name == "StableDiffusionPipeline":
        from .pipelines.sd import StableDiffusionPipeline

        return StableDiffusionPipeline
    if name == "StableDiffusionXLPipeline":
        from .pipelines.sdxl import StableDiffusionXLPipeline

        return StableDiffusionXLPipeline
    if name == "LoRAManager":
        from .lora_manager import LoRAManager

        return LoRAManager
    raise AttributeError(name)
