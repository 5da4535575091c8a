"""Export to the original CompVis/A1111 `.ckpt` layout
(reference to_ckpt_v2.py: diffusers dir -> SD checkpoint).

Key maps are generated from the model config instead of hardcoded tables,
so they also cover reduced test configs. Weights stay in torch layout
throughout, so this is pure renaming plus the VAE-attention linear->1x1-conv
reshape (to_ckpt_v2.py:180-192).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models import structure
from ..models.config import UNetConfig, VAEConfig

_RESNET_UNET = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}

_RESNET_VAE = {
    "norm1": "norm1",
    "conv1": "conv1",
    "norm2": "norm2",
    "conv2": "conv2",
    "conv_shortcut": "nin_shortcut",
}

_ATTN_VAE = {
    "group_norm": "norm",
    "to_q": "q",
    "to_k": "k",
    "to_v": "v",
    "to_out.0": "proj_out",
}


def unet_key_map(cfg: UNetConfig) -> Dict[str, str]:
    m = {
        "conv_in": "input_blocks.0.0",
        "time_embedding.linear_1": "time_embed.0",
        "time_embedding.linear_2": "time_embed.2",
        "conv_norm_out": "out.0",
        "conv_out": "out.2",
    }

    def resnet(src, dst):
        for a, b in _RESNET_UNET.items():
            m[f"{src}.{a}"] = f"{dst}.{b}"

    idx = 1
    downs = structure.down_blocks(cfg)
    for i, block in enumerate(downs):
        for j in range(len(block.resnets)):
            resnet(f"down_blocks.{i}.resnets.{j}", f"input_blocks.{idx}.0")
            if block.attentions[j] is not None:
                m[f"down_blocks.{i}.attentions.{j}"] = f"input_blocks.{idx}.1"
            idx += 1
        if block.has_downsample:
            m[f"down_blocks.{i}.downsamplers.0.conv"] = \
                f"input_blocks.{idx}.0.op"
            idx += 1

    resnet("mid_block.resnets.0", "middle_block.0")
    m["mid_block.attentions.0"] = "middle_block.1"
    resnet("mid_block.resnets.1", "middle_block.2")

    idx = 0
    for i, block in enumerate(structure.up_blocks(cfg)):
        for j in range(len(block.resnets)):
            resnet(f"up_blocks.{i}.resnets.{j}", f"output_blocks.{idx}.0")
            has_attn = block.attentions[j] is not None
            if has_attn:
                m[f"up_blocks.{i}.attentions.{j}"] = f"output_blocks.{idx}.1"
            if j == len(block.resnets) - 1 and block.has_upsample:
                sub = 2 if has_attn else 1
                m[f"up_blocks.{i}.upsamplers.0.conv"] = \
                    f"output_blocks.{idx}.{sub}.conv"
            idx += 1
    return m


def vae_key_map(cfg: VAEConfig) -> Dict[str, str]:
    n = len(cfg.block_out_channels)
    m = {
        "encoder.conv_in": "encoder.conv_in",
        "encoder.conv_norm_out": "encoder.norm_out",
        "encoder.conv_out": "encoder.conv_out",
        "decoder.conv_in": "decoder.conv_in",
        "decoder.conv_norm_out": "decoder.norm_out",
        "decoder.conv_out": "decoder.conv_out",
        "quant_conv": "quant_conv",
        "post_quant_conv": "post_quant_conv",
    }

    def resnet(src, dst):
        for a, b in _RESNET_VAE.items():
            m[f"{src}.{a}"] = f"{dst}.{b}"

    def attn(src, dst):
        for a, b in _ATTN_VAE.items():
            m[f"{src}.{a}"] = f"{dst}.{b}"

    for i in range(n):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   f"encoder.down.{i}.block.{j}")
        if i < n - 1:
            m[f"encoder.down_blocks.{i}.downsamplers.0.conv"] = \
                f"encoder.down.{i}.downsample.conv"
    resnet("encoder.mid_block.resnets.0", "encoder.mid.block_1")
    resnet("encoder.mid_block.resnets.1", "encoder.mid.block_2")
    attn("encoder.mid_block.attentions.0", "encoder.mid.attn_1")

    resnet("decoder.mid_block.resnets.0", "decoder.mid.block_1")
    resnet("decoder.mid_block.resnets.1", "decoder.mid.block_2")
    attn("decoder.mid_block.attentions.0", "decoder.mid.attn_1")
    for i in range(n):
        # CompVis numbers decoder up blocks in reverse
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   f"decoder.up.{n - 1 - i}.block.{j}")
        if i < n - 1:
            m[f"decoder.up_blocks.{i}.upsamplers.0.conv"] = \
                f"decoder.up.{n - 1 - i}.upsample.conv"
    return m


def _apply_map(params: Dict[str, np.ndarray], key_map: Dict[str, str],
               prefix: str) -> Dict[str, np.ndarray]:
    # longest-prefix rename so attention-subtree keys map through
    items = sorted(key_map.items(), key=lambda kv: -len(kv[0]))
    out = {}
    for k, v in params.items():
        stem, _, leaf = k.rpartition(".")
        new = None
        for src, dst in items:
            if k.startswith(src + ".") or stem == src:
                new = dst + k[len(src):]
                break
        if new is None:
            new = k  # identical naming (e.g. transformer blocks inside attn)
        out[prefix + new] = np.asarray(v)
    return out


def _invert(key_map: Dict[str, str]) -> Dict[str, str]:
    return {v: k for k, v in key_map.items()}


def params_from_ckpt(checkpoint_path: str, unet_cfg: UNetConfig,
                     vae_cfg: VAEConfig):
    """Import a CompVis/A1111 ``.ckpt`` back into this framework's
    (unet_params, text_params, vae_params) numpy dicts — the inverse of
    :func:`convert_to_ckpt` (the reference only exports; importing makes
    round-trips and community checkpoints loadable)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu",
                    weights_only=False)["state_dict"]

    groups = {"model.diffusion_model.": {}, "first_stage_model.": {},
              "cond_stage_model.transformer.": {}}
    for k, v in sd.items():
        for prefix, d in groups.items():
            if k.startswith(prefix):
                d[k[len(prefix):]] = v.float().numpy()
                break

    unet_p = _apply_map(groups["model.diffusion_model."],
                        _invert(unet_key_map(unet_cfg)), "")
    vae_p = _apply_map(groups["first_stage_model."],
                       _invert(vae_key_map(vae_cfg)), "")
    # VAE attention projections come back as 1x1 convs; squeeze to linear
    for k, v in vae_p.items():
        if ".attentions.0." in k and k.endswith(".weight") and v.ndim == 4:
            vae_p[k] = v[:, :, 0, 0]
    return unet_p, groups["cond_stage_model.transformer."], vae_p


def convert_to_ckpt(pipe, checkpoint_path: str, as_half: bool = True) -> None:
    """Export pipeline params to a CompVis .ckpt (torch file with
    {"state_dict": ...}) — reference convert_to_ckpt (to_ckpt_v2.py:198-232)."""
    import torch

    unet_sd = _apply_map({k: np.asarray(v) for k, v in pipe.unet_params.items()},
                         unet_key_map(pipe.unet_cfg),
                         "model.diffusion_model.")
    vae_np = {}
    for k, v in pipe.vae_params.items():
        v = np.asarray(v)
        # VAE attention projections are 1x1 convs in the CompVis layout
        if ".attentions.0." in k and k.endswith(".weight") and v.ndim == 2:
            v = v[:, :, None, None]
        vae_np[k] = v
    vae_sd = _apply_map(vae_np, vae_key_map(pipe.vae_cfg), "first_stage_model.")
    text_sd = {f"cond_stage_model.transformer.{k}": np.asarray(v)
               for k, v in pipe.text_params.items()}

    state_dict = {}
    for sd in (unet_sd, vae_sd, text_sd):
        for k, v in sd.items():
            t = torch.from_numpy(np.array(v))
            if as_half and t.is_floating_point():
                t = t.half()
            state_dict[k] = t
    torch.save({"state_dict": state_dict}, checkpoint_path)
