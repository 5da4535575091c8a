"""Model configurations.

SD15_UNET/SD15_VAE/SD15_TEXT mirror the published Stable-Diffusion-1.5
configs (runwayml/stable-diffusion-v1-5 {unet,vae,text_encoder}/config.json)
that the reference loads via diffusers/transformers from_pretrained
(cli_lora_pti.py:58-127).  TINY_* are scaled-down variants for CPU tests.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    # block types, bottom of the U last. True = has cross-attention.
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    layers_per_block: int = 2
    # Number of attention heads per transformer (diffusers' misnamed
    # `attention_head_dim=8` for SD1.x actually sets num_heads=8).
    num_attention_heads: int = 8
    transformer_layers: int = 1
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    freq_shift: int = 0
    flip_sin_to_cos: bool = True


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    # room reserved for textual-inversion placeholder rows (jit-static)
    max_extra_tokens: int = 16


SD15_UNET = UNetConfig()
SD15_VAE = VAEConfig()
SD15_TEXT = CLIPTextConfig()

# Tiny configs for CPU unit tests: same topology, small dims.
TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64, 64, 64),
    num_attention_heads=2,
    cross_attention_dim=32,
    norm_num_groups=8,
)
TINY_VAE = VAEConfig(block_out_channels=(16, 16, 32, 32), norm_num_groups=8)
TINY_TEXT = CLIPTextConfig(
    vocab_size=1000,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    max_extra_tokens=8,
)
