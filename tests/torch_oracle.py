"""Independent torch oracle for UNet/VAE numerics.

A straight-line torch interpreter of the ORIGINAL CompVis/LDM checkpoint
layout (`model.diffusion_model.*` / `first_stage_model.*` keys), written from
the original Stable Diffusion architecture semantics — GroupNorm32 resblocks
with in_layers/emb_layers/out_layers, SpatialTransformer with GEGLU feed
forward, single-head conv-projection VAE attention, asymmetric-pad VAE
downsampling. Structure is discovered from the state_dict keys themselves,
not from this repo's config walker, so a transcription error in
lora_tpu.models.{unet,vae} or formats.ckpt_export cannot be mirrored here.

Used by tests/test_torch_oracle.py: random-init the JAX pipeline, export via
convert_to_ckpt, run both forwards on the same inputs, assert agreement
(the cross-implementation check VERDICT r1 asked for; same rigor as
tests/test_clip_hf_parity.py gives CLIP).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def _gn(sd, key, x, groups, eps):
    return F.group_norm(x, groups, sd[key + ".weight"], sd[key + ".bias"], eps)


def _ln(sd, key, x):
    return F.layer_norm(x, x.shape[-1:], sd[key + ".weight"], sd[key + ".bias"])


def _conv(sd, key, x, stride=1, pad=0):
    return F.conv2d(x, sd[key + ".weight"], sd.get(key + ".bias"),
                    stride=stride, padding=pad)


def _lin(sd, key, x):
    return F.linear(x, sd[key + ".weight"], sd.get(key + ".bias"))


# ---------------------------------------------------------------------------
# UNet (model.diffusion_model.*)
# ---------------------------------------------------------------------------

def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _resblock(sd, p, x, emb, groups):
    h = _conv(sd, p + ".in_layers.2", F.silu(_gn(sd, p + ".in_layers.0", x,
                                                 groups, 1e-5)), pad=1)
    h = h + _lin(sd, p + ".emb_layers.1", F.silu(emb))[:, :, None, None]
    h = _conv(sd, p + ".out_layers.3", F.silu(_gn(sd, p + ".out_layers.0", h,
                                                  groups, 1e-5)), pad=1)
    if p + ".skip_connection.weight" in sd:
        x = _conv(sd, p + ".skip_connection", x)
    return x + h


def _mha(sd, p, x, ctx, heads):
    q, k, v = (_lin(sd, p + n, s) for n, s in
               ((".to_q", x), (".to_k", ctx), (".to_v", ctx)))
    B, T, C = q.shape
    dh = C // heads

    def heads_first(y):
        return y.view(B, y.shape[1], heads, dh).permute(0, 2, 1, 3)

    q, k, v = heads_first(q), heads_first(k), heads_first(v)
    w = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
    out = (w @ v).permute(0, 2, 1, 3).reshape(B, T, C)
    return _lin(sd, p + ".to_out.0", out)


def _spatial_transformer(sd, p, x, ctx, heads, groups, head_dim=None):
    B, C, H, W = x.shape
    res = x
    h = _gn(sd, p + ".norm", x, groups, 1e-6)
    # SD2.x (use_linear_in_transformer): proj_in/proj_out are Linear applied
    # AFTER flattening; detected from the checkpoint weight rank itself
    linear_proj = sd[p + ".proj_in.weight"].dim() == 2
    if linear_proj:
        h = _lin(sd, p + ".proj_in", h.view(B, C, H * W).permute(0, 2, 1))
    else:
        h = _conv(sd, p + ".proj_in", h).view(B, C, H * W).permute(0, 2, 1)
    if head_dim is not None:  # SD2.x: constant head dim, per-level head count
        heads = C // head_dim
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in sd:
        tb = f"{p}.transformer_blocks.{i}"
        y = _ln(sd, tb + ".norm1", h)
        h = h + _mha(sd, tb + ".attn1", y, y, heads)
        h = h + _mha(sd, tb + ".attn2", _ln(sd, tb + ".norm2", h), ctx, heads)
        a, gate = _lin(sd, tb + ".ff.net.0.proj",
                       _ln(sd, tb + ".norm3", h)).chunk(2, dim=-1)
        h = h + _lin(sd, tb + ".ff.net.2", a * F.gelu(gate))
        i += 1
    if linear_proj:
        h = _lin(sd, p + ".proj_out", h).permute(0, 2, 1).view(B, C, H, W)
    else:
        h = _conv(sd, p + ".proj_out", h.permute(0, 2, 1).view(B, C, H, W))
    return h + res


def unet_forward(sd, x, t, context, heads=None, groups=32, head_dim=None):
    """x (B, Cin, H, W) NCHW; t (B,); context (B, S, D). Returns eps pred.

    `heads` is the flat SD1.x head count; pass `head_dim` instead for SD2.x
    topologies (per-level head count = channels // head_dim)."""
    model_ch = sd["time_embed.0.weight"].shape[1]
    emb = _lin(sd, "time_embed.0", timestep_embedding(t, model_ch))
    emb = _lin(sd, "time_embed.2", F.silu(emb))

    skips = []
    h = x
    i = 0
    while True:
        p = f"input_blocks.{i}"
        if f"{p}.0.weight" in sd:                        # stem conv
            h = _conv(sd, p + ".0", h, pad=1)
        elif f"{p}.0.op.weight" in sd:                   # downsample
            h = _conv(sd, p + ".0.op", h, stride=2, pad=1)
        elif f"{p}.0.in_layers.0.weight" in sd:          # resblock [+ attn]
            h = _resblock(sd, p + ".0", h, emb, groups)
            if f"{p}.1.norm.weight" in sd:
                h = _spatial_transformer(sd, p + ".1", h, context, heads,
                                         groups, head_dim)
        else:
            break
        skips.append(h)
        i += 1

    h = _resblock(sd, "middle_block.0", h, emb, groups)
    h = _spatial_transformer(sd, "middle_block.1", h, context, heads,
                             groups, head_dim)
    h = _resblock(sd, "middle_block.2", h, emb, groups)

    i = 0
    while f"output_blocks.{i}.0.in_layers.0.weight" in sd:
        p = f"output_blocks.{i}"
        h = _resblock(sd, p + ".0", torch.cat([h, skips.pop()], dim=1), emb,
                      groups)
        if f"{p}.1.norm.weight" in sd:
            h = _spatial_transformer(sd, p + ".1", h, context, heads, groups,
                                     head_dim)
        for sub in (1, 2):
            if f"{p}.{sub}.conv.weight" in sd:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = _conv(sd, f"{p}.{sub}.conv", h, pad=1)
        i += 1

    return _conv(sd, "out.2", F.silu(_gn(sd, "out.0", h, groups, 1e-5)), pad=1)


# ---------------------------------------------------------------------------
# VAE (first_stage_model.*)
# ---------------------------------------------------------------------------

def _vae_resblock(sd, p, x, groups):
    h = _conv(sd, p + ".conv1", F.silu(_gn(sd, p + ".norm1", x, groups, 1e-6)),
              pad=1)
    h = _conv(sd, p + ".conv2", F.silu(_gn(sd, p + ".norm2", h, groups, 1e-6)),
              pad=1)
    if p + ".nin_shortcut.weight" in sd:
        x = _conv(sd, p + ".nin_shortcut", x)
    return x + h


def _vae_attn(sd, p, x, groups):
    B, C, H, W = x.shape
    h = _gn(sd, p + ".norm", x, groups, 1e-6)
    q = _conv(sd, p + ".q", h).view(B, C, H * W)
    k = _conv(sd, p + ".k", h).view(B, C, H * W)
    v = _conv(sd, p + ".v", h).view(B, C, H * W)
    w = torch.softmax(q.permute(0, 2, 1) @ k * C ** -0.5, dim=2)  # (B,hq,hk)
    h = (v @ w.permute(0, 2, 1)).view(B, C, H, W)
    return x + _conv(sd, p + ".proj_out", h)


def vae_encode_moments(sd, x, groups=32):
    """Image (B, 3, H, W) -> moments (B, 2*z, h, w): mean|logvar."""
    h = _conv(sd, "encoder.conv_in", x, pad=1)
    i = 0
    while f"encoder.down.{i}.block.0.norm1.weight" in sd:
        j = 0
        while f"encoder.down.{i}.block.{j}.norm1.weight" in sd:
            h = _vae_resblock(sd, f"encoder.down.{i}.block.{j}", h, groups)
            j += 1
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            h = F.pad(h, (0, 1, 0, 1))  # CompVis asymmetric pad
            h = _conv(sd, f"encoder.down.{i}.downsample.conv", h, stride=2)
        i += 1
    h = _vae_resblock(sd, "encoder.mid.block_1", h, groups)
    h = _vae_attn(sd, "encoder.mid.attn_1", h, groups)
    h = _vae_resblock(sd, "encoder.mid.block_2", h, groups)
    h = _conv(sd, "encoder.conv_out",
              F.silu(_gn(sd, "encoder.norm_out", h, groups, 1e-6)), pad=1)
    return _conv(sd, "quant_conv", h)


def vae_decode(sd, z, groups=32):
    """Unscaled latent (B, z, h, w) -> image (B, 3, H, W)."""
    h = _conv(sd, "decoder.conv_in", _conv(sd, "post_quant_conv", z), pad=1)
    h = _vae_resblock(sd, "decoder.mid.block_1", h, groups)
    h = _vae_attn(sd, "decoder.mid.attn_1", h, groups)
    h = _vae_resblock(sd, "decoder.mid.block_2", h, groups)
    levels = 0
    while f"decoder.up.{levels}.block.0.norm1.weight" in sd:
        levels += 1
    for i in reversed(range(levels)):  # CompVis iterates top level first
        j = 0
        while f"decoder.up.{i}.block.{j}.norm1.weight" in sd:
            h = _vae_resblock(sd, f"decoder.up.{i}.block.{j}", h, groups)
            j += 1
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(sd, f"decoder.up.{i}.upsample.conv", h, pad=1)
    return _conv(sd, "decoder.conv_out",
                 F.silu(_gn(sd, "decoder.norm_out", h, groups, 1e-6)), pad=1)
