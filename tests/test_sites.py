"""Site-registry parity: our generated site order must reproduce the
reference's `_find_modules` traversal — checked shape-by-shape against the
golden files (the strongest order oracle available without diffusers)."""

import numpy as np

from lora_tpu.core.sites import (
    text_encoder_lora_sites,
    unet_lora_sites,
)
from lora_tpu.formats.reader import SafetensorsFile
from lora_tpu.formats.safetensors_io import UNET_EXTENDED_TARGET_REPLACE
from lora_tpu.models.config import SD15_TEXT, SD15_UNET, TINY_UNET


def test_unet_site_order_matches_golden(golden_disney):
    sites = unet_lora_sites(SD15_UNET)
    assert len(sites) == 144
    with SafetensorsFile(golden_disney) as f:
        for i, s in enumerate(sites):
            down = f.shape(f"unet:{i}:down")
            up = f.shape(f"unet:{i}:up")
            assert down == (1, s.in_dim), (i, s.name, down)
            assert up == (s.out_dim, 1), (i, s.name, up)


def test_unet_site_order_matches_golden_svd(golden_svd):
    sites = unet_lora_sites(SD15_UNET)
    with SafetensorsFile(golden_svd) as f:
        for i, s in enumerate(sites):
            assert f.shape(f"unet:{i}:down") == (4, s.in_dim)
            assert f.shape(f"unet:{i}:up") == (s.out_dim, 4)


def test_unet_site_structure():
    sites = unet_lora_sites(SD15_UNET)
    # first block: attn1 q/k/v/out, geglu, attn2 q/k/v/out
    names = [s.name for s in sites[:9]]
    assert names == [
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_v",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_q",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_v",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0",
    ]
    # mid block comes last (torch registration order artifact)
    assert sites[-9].name.startswith("mid_block.attentions.0")


def test_text_encoder_sites():
    sites = text_encoder_lora_sites(SD15_TEXT)
    assert len(sites) == 48
    assert [s.name.rsplit(".", 1)[1] for s in sites[:4]] == [
        "k_proj", "v_proj", "q_proj", "out_proj",
    ]
    assert all(s.in_dim == s.out_dim == 768 for s in sites)


def test_extended_sites_include_resnets():
    sites = unet_lora_sites(SD15_UNET, UNET_EXTENDED_TARGET_REPLACE)
    convs = [s for s in sites if s.kind == "conv"]
    linears = [s for s in sites if s.kind == "linear"]
    # resnet count: down 4*2 + up 4*3 + mid 2 = 22 resnets
    time_projs = [s for s in linears if "time_emb_proj" in s.name]
    assert len(time_projs) == 22
    shortcuts = [s for s in convs if "conv_shortcut" in s.name]
    # shortcuts: down_blocks 1,2 first resnets (2) + all 12 up resnets
    assert len(shortcuts) == 14
    assert len([s for s in convs if "conv1" in s.name]) == 22
    # attn sites still present and before resnets within a block
    idx_attn = next(i for i, s in enumerate(sites)
                    if s.name == "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q")
    idx_res = next(i for i, s in enumerate(sites)
                   if s.name == "down_blocks.0.resnets.0.conv1")
    assert idx_attn < idx_res


def test_tiny_config_sites_consistent():
    sites = unet_lora_sites(TINY_UNET)
    assert len(sites) == 144  # same topology, smaller dims
    assert all(s.in_dim >= 4 for s in sites)
