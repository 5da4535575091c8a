"""UNet2DCondition (SD-1.x / SD-2.x / SDXL topologies), functional JAX/NHWC.

Replaces the reference's `diffusers.UNet2DConditionModel` dependency
(cli_lora_pti.py:120-127). Param names match the HF diffusers state_dict so
import is an identity mapping; structure comes from models/structure.py.
LoRA rides through every dense/conv via the lora context (models/layers.py),
covering both the default attention/GEGLU targets and the extended
ResnetBlock2D targets (lora.py:159-161).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from . import structure
from .config import UNetConfig
from .layers import (
    Params,
    conv2d,
    dense,
    gelu,
    group_norm,
    layer_norm,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, o, i, kh, kw, dtype):
    fan_in = i * kh * kw
    std = (1.0 / fan_in) ** 0.5
    return (jax.random.uniform(key, (o, i, kh, kw), jnp.float32, -std, std)
            ).astype(dtype)


def _lin_init(key, o, i, dtype):
    std = (1.0 / i) ** 0.5
    return (jax.random.uniform(key, (o, i), jnp.float32, -std, std)).astype(dtype)


class _Init:
    def __init__(self, rng, dtype):
        self.rng = rng
        self.dtype = dtype
        self.p: Params = {}

    def key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def conv(self, name, i, o, k=3):
        self.p[name + ".weight"] = _conv_init(self.key(), o, i, k, k, self.dtype)
        self.p[name + ".bias"] = jnp.zeros((o,), self.dtype)

    def lin(self, name, i, o):
        self.p[name + ".weight"] = _lin_init(self.key(), o, i, self.dtype)
        self.p[name + ".bias"] = jnp.zeros((o,), self.dtype)

    def lin_nobias(self, name, i, o):
        self.p[name + ".weight"] = _lin_init(self.key(), o, i, self.dtype)

    def norm(self, name, c):
        self.p[name + ".weight"] = jnp.ones((c,), self.dtype)
        self.p[name + ".bias"] = jnp.zeros((c,), self.dtype)


def _init_resnet(ini: _Init, prefix: str, spec: structure.ResnetSpec):
    ini.norm(prefix + ".norm1", spec.in_channels)
    ini.conv(prefix + ".conv1", spec.in_channels, spec.out_channels)
    ini.lin(prefix + ".time_emb_proj", spec.temb_channels, spec.out_channels)
    ini.norm(prefix + ".norm2", spec.out_channels)
    ini.conv(prefix + ".conv2", spec.out_channels, spec.out_channels)
    if spec.has_shortcut:
        ini.conv(prefix + ".conv_shortcut", spec.in_channels, spec.out_channels,
                 k=1)


def _init_transformer(ini: _Init, prefix: str, spec: structure.AttnSpec):
    c, xd = spec.channels, spec.cross_dim
    ini.norm(prefix + ".norm", c)
    if spec.linear_proj:  # SD2.x: Linear over the flattened sequence
        ini.lin(prefix + ".proj_in", c, c)
    else:
        ini.conv(prefix + ".proj_in", c, c, k=1)
    for k in range(spec.n_blocks):
        tb = f"{prefix}.transformer_blocks.{k}"
        for n in ("norm1", "norm2", "norm3"):
            ini.norm(f"{tb}.{n}", c)
        for a, kv in (("attn1", c), ("attn2", xd)):
            ini.lin_nobias(f"{tb}.{a}.to_q", c, c)
            ini.lin_nobias(f"{tb}.{a}.to_k", kv, c)
            ini.lin_nobias(f"{tb}.{a}.to_v", kv, c)
            ini.lin(f"{tb}.{a}.to_out.0", c, c)
        ini.lin(f"{tb}.ff.net.0.proj", c, 8 * c)
        ini.lin(f"{tb}.ff.net.2", 4 * c, c)
    if spec.linear_proj:
        ini.lin(prefix + ".proj_out", c, c)
    else:
        ini.conv(prefix + ".proj_out", c, c, k=1)


def init_unet(cfg: UNetConfig, rng: jax.Array, dtype=jnp.float32) -> Params:
    ini = _Init(rng, dtype)
    c0 = cfg.block_out_channels[0]
    temb = structure.time_embed_dim(cfg)
    ini.conv("conv_in", cfg.in_channels, c0)
    ini.lin("time_embedding.linear_1", c0, temb)
    ini.lin("time_embedding.linear_2", temb, temb)
    if cfg.addition_embed_type == "text_time":
        # SDXL micro-conditioning MLP over [pooled text | sinus(time_ids)]
        ini.lin("add_embedding.linear_1",
                cfg.projection_class_embeddings_input_dim, temb)
        ini.lin("add_embedding.linear_2", temb, temb)

    for i, block in enumerate(structure.down_blocks(cfg)):
        pre = f"down_blocks.{i}"
        for j, res in enumerate(block.resnets):
            _init_resnet(ini, f"{pre}.resnets.{j}", res)
        for j, attn in enumerate(block.attentions):
            if attn is not None:
                _init_transformer(ini, f"{pre}.attentions.{j}", attn)
        if block.has_downsample:
            out_ch = block.resnets[-1].out_channels
            ini.conv(f"{pre}.downsamplers.0.conv", out_ch, out_ch)

    mid = structure.mid_block(cfg)
    _init_resnet(ini, "mid_block.resnets.0", mid.resnets[0])
    _init_transformer(ini, "mid_block.attentions.0", mid.attentions[0])
    _init_resnet(ini, "mid_block.resnets.1", mid.resnets[1])

    for i, block in enumerate(structure.up_blocks(cfg)):
        pre = f"up_blocks.{i}"
        for j, res in enumerate(block.resnets):
            _init_resnet(ini, f"{pre}.resnets.{j}", res)
        for j, attn in enumerate(block.attentions):
            if attn is not None:
                _init_transformer(ini, f"{pre}.attentions.{j}", attn)
        if block.has_upsample:
            out_ch = block.resnets[-1].out_channels
            ini.conv(f"{pre}.upsamplers.0.conv", out_ch, out_ch)

    ini.norm("conv_norm_out", cfg.block_out_channels[0])
    ini.conv("conv_out", cfg.block_out_channels[0], cfg.out_channels)
    return ini.p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _resnet(p: Params, prefix: str, x, temb, cfg: UNetConfig,
            spec: structure.ResnetSpec, lora):
    h = group_norm(p, prefix + ".norm1", x, cfg.norm_num_groups, cfg.norm_eps)
    h = conv2d(p, prefix + ".conv1", silu(h), padding=(1, 1), lora=lora)
    t = dense(p, prefix + ".time_emb_proj", silu(temb), lora)
    h = h + t[:, None, None, :]
    h = group_norm(p, prefix + ".norm2", h, cfg.norm_num_groups, cfg.norm_eps)
    h = conv2d(p, prefix + ".conv2", silu(h), padding=(1, 1), lora=lora)
    if spec.has_shortcut:
        x = conv2d(p, prefix + ".conv_shortcut", x, lora=lora)
    return x + h


def _attention(p: Params, prefix: str, x, ctx, heads: int, lora):
    """One CrossAttention: x (B, T, C) queries, ctx (B, S, Ckv) keys/values."""
    B, T, C = x.shape
    dh = C // heads
    q = dense(p, prefix + ".to_q", x, lora)
    k = dense(p, prefix + ".to_k", ctx, lora)
    v = dense(p, prefix + ".to_v", ctx, lora)
    S = ctx.shape[1]

    def split(y, L):
        return y.reshape(B, L, heads, dh).transpose(0, 2, 1, 3)

    att = attention(split(q, T), split(k, S), split(v, S))
    att = att.transpose(0, 2, 1, 3).reshape(B, T, C)
    return dense(p, prefix + ".to_out.0", att, lora)


def _ff_geglu(p: Params, prefix: str, x, lora):
    y = dense(p, prefix + ".net.0.proj", x, lora)
    val, gate = jnp.split(y, 2, axis=-1)
    return dense(p, prefix + ".net.2", val * gelu(gate), lora)


def _transformer(p: Params, prefix: str, x, ctx, cfg: UNetConfig,
                 spec: structure.AttnSpec, lora):
    B, H, W, C = x.shape
    res = x
    h = group_norm(p, prefix + ".norm", x, cfg.norm_num_groups, 1e-6)
    if spec.linear_proj:  # SD2.x: flatten first, then Linear (diffusers order)
        h = dense(p, prefix + ".proj_in", h.reshape(B, H * W, C), lora)
    else:
        h = conv2d(p, prefix + ".proj_in", h, lora=lora)
        h = h.reshape(B, H * W, C)
    for k in range(spec.n_blocks):
        tb = f"{prefix}.transformer_blocks.{k}"
        y = layer_norm(p, f"{tb}.norm1", h, 1e-5)
        h = h + _attention(p, f"{tb}.attn1", y, y, spec.num_heads, lora)
        y = layer_norm(p, f"{tb}.norm2", h, 1e-5)
        h = h + _attention(p, f"{tb}.attn2", y, ctx.astype(h.dtype),
                           spec.num_heads, lora)
        y = layer_norm(p, f"{tb}.norm3", h, 1e-5)
        h = h + _ff_geglu(p, f"{tb}.ff", y, lora)
    if spec.linear_proj:  # Linear before unflattening (diffusers order)
        h = dense(p, prefix + ".proj_out", h, lora)
        h = h.reshape(B, H, W, C)
    else:
        h = h.reshape(B, H, W, C)
        h = conv2d(p, prefix + ".proj_out", h, lora=lora)
    return h + res


def unet_forward(
    params: Params,
    sample: jax.Array,            # (B, H, W, Cin) latents, NHWC
    timesteps: jax.Array,         # (B,) int/float
    encoder_hidden_states: jax.Array,  # (B, S, cross_dim)
    cfg: UNetConfig,
    lora=None,
    remat: bool = False,
    added_cond: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """added_cond (SDXL, cfg.addition_embed_type == "text_time"):
    {"text_embeds": (B, pooled_dim), "time_ids": (B, 6)} — the pooled
    text-encoder-2 embedding plus original-size/crop/target-size ids,
    embedded and summed into the timestep embedding."""
    dt = sample.dtype
    c0 = cfg.block_out_channels[0]
    if (added_cond is None) != (cfg.addition_embed_type is None):
        raise ValueError(
            f"added_cond must be passed iff the config declares "
            f"addition_embed_type (got added_cond="
            f"{'set' if added_cond is not None else 'None'} with "
            f"addition_embed_type={cfg.addition_embed_type!r})")

    # gradient checkpointing: rematerialize each resnet/transformer block in
    # the backward pass (reference enable_gradient_checkpointing,
    # train_lora_dreambooth.py:627-630) — trades FLOPs for HBM
    resnet_fn, transformer_fn = _resnet, _transformer
    if remat:
        resnet_fn = jax.checkpoint(_resnet, static_argnums=(1, 4, 5))
        transformer_fn = jax.checkpoint(_transformer, static_argnums=(1, 4, 5))

    temb = timestep_embedding(
        timesteps, c0, flip_sin_to_cos=cfg.flip_sin_to_cos,
        freq_shift=cfg.freq_shift,
    ).astype(dt)
    temb = dense(params, "time_embedding.linear_1", temb, lora=None)
    temb = dense(params, "time_embedding.linear_2", silu(temb), lora=None)

    if added_cond is not None:
        # SDXL "text_time": six time_ids each get a sinusoidal embedding
        # (same [cos|sin] layout as timesteps), flattened and concatenated
        # after the pooled text embed, then a 2-layer MLP; the result is
        # summed into the timestep embedding before any block consumes it.
        text_embeds = added_cond["text_embeds"]
        time_ids = added_cond["time_ids"]
        B = time_ids.shape[0]
        t_emb = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim,
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        ).reshape(B, -1)
        add = jnp.concatenate(
            [text_embeds.astype(dt), t_emb.astype(dt)], axis=-1)
        add = dense(params, "add_embedding.linear_1", add, lora=None)
        add = dense(params, "add_embedding.linear_2", silu(add), lora=None)
        temb = temb + add

    h = conv2d(params, "conv_in", sample, padding=(1, 1))
    skips: List[jax.Array] = [h]

    for i, block in enumerate(structure.down_blocks(cfg)):
        pre = f"down_blocks.{i}"
        for j, res in enumerate(block.resnets):
            h = resnet_fn(params, f"{pre}.resnets.{j}", h, temb, cfg, res, lora)
            if block.attentions[j] is not None:
                h = transformer_fn(params, f"{pre}.attentions.{j}", h,
                                 encoder_hidden_states, cfg,
                                 block.attentions[j], lora)
            skips.append(h)
        if block.has_downsample:
            # lora covers the kohya/LoCon conv targets (core/sites.py
            # unet_locon_sites); inert for reference-format adapters
            h = conv2d(params, f"{pre}.downsamplers.0.conv", h,
                       stride=(2, 2), padding=(1, 1), lora=lora)
            skips.append(h)

    mid = structure.mid_block(cfg)
    h = resnet_fn(params, "mid_block.resnets.0", h, temb, cfg, mid.resnets[0], lora)
    h = transformer_fn(params, "mid_block.attentions.0", h, encoder_hidden_states,
                     cfg, mid.attentions[0], lora)
    h = resnet_fn(params, "mid_block.resnets.1", h, temb, cfg, mid.resnets[1], lora)

    for i, block in enumerate(structure.up_blocks(cfg)):
        pre = f"up_blocks.{i}"
        for j, res in enumerate(block.resnets):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = resnet_fn(params, f"{pre}.resnets.{j}", h, temb, cfg, res, lora)
            if block.attentions[j] is not None:
                h = transformer_fn(params, f"{pre}.attentions.{j}", h,
                                 encoder_hidden_states, cfg,
                                 block.attentions[j], lora)
        if block.has_upsample:
            h = upsample_nearest_2x(h)
            h = conv2d(params, f"{pre}.upsamplers.0.conv", h, padding=(1, 1),
                       lora=lora)

    h = group_norm(params, "conv_norm_out", h, cfg.norm_num_groups, cfg.norm_eps)
    h = conv2d(params, "conv_out", silu(h), padding=(1, 1))
    return h
