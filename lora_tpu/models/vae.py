"""AutoencoderKL (SD-1.5 VAE), functional JAX/NHWC.

Replaces the reference's `diffusers.AutoencoderKL` (cli_lora_pti.py:111-118).
Param names follow the modern diffusers state_dict; hf_import also maps the
legacy AttentionBlock naming (query/key/value/proj_attn) onto
to_q/to_k/to_v/to_out.0.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .config import VAEConfig
from .layers import Params, conv2d, dense, group_norm, silu, upsample_nearest_2x
from .unet import _conv_init, _lin_init

EPS = 1e-6


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

class _Init:
    def __init__(self, rng, dtype):
        self.rng, self.dtype, self.p = rng, dtype, {}

    def key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def conv(self, name, i, o, k=3):
        self.p[name + ".weight"] = _conv_init(self.key(), o, i, k, k, self.dtype)
        self.p[name + ".bias"] = jnp.zeros((o,), self.dtype)

    def lin(self, name, i, o):
        self.p[name + ".weight"] = _lin_init(self.key(), o, i, self.dtype)
        self.p[name + ".bias"] = jnp.zeros((o,), self.dtype)

    def norm(self, name, c):
        self.p[name + ".weight"] = jnp.ones((c,), self.dtype)
        self.p[name + ".bias"] = jnp.zeros((c,), self.dtype)


def _init_resnet(ini, prefix, cin, cout):
    ini.norm(prefix + ".norm1", cin)
    ini.conv(prefix + ".conv1", cin, cout)
    ini.norm(prefix + ".norm2", cout)
    ini.conv(prefix + ".conv2", cout, cout)
    if cin != cout:
        ini.conv(prefix + ".conv_shortcut", cin, cout, k=1)


def _init_attn(ini, prefix, c):
    ini.norm(prefix + ".group_norm", c)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        ini.lin(f"{prefix}.{n}", c, c)


def init_vae(cfg: VAEConfig, rng: jax.Array, dtype=jnp.float32) -> Params:
    ini = _Init(rng, dtype)
    chs = cfg.block_out_channels
    n = len(chs)

    # encoder
    ini.conv("encoder.conv_in", cfg.in_channels, chs[0])
    cin = chs[0]
    for i, ch in enumerate(chs):
        for j in range(cfg.layers_per_block):
            _init_resnet(ini, f"encoder.down_blocks.{i}.resnets.{j}",
                         cin if j == 0 else ch, ch)
        cin = ch
        if i < n - 1:
            ini.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    c = chs[-1]
    _init_resnet(ini, "encoder.mid_block.resnets.0", c, c)
    _init_attn(ini, "encoder.mid_block.attentions.0", c)
    _init_resnet(ini, "encoder.mid_block.resnets.1", c, c)
    ini.norm("encoder.conv_norm_out", c)
    ini.conv("encoder.conv_out", c, 2 * cfg.latent_channels)
    ini.conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)

    # decoder
    ini.conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    ini.conv("decoder.conv_in", cfg.latent_channels, c)
    _init_resnet(ini, "decoder.mid_block.resnets.0", c, c)
    _init_attn(ini, "decoder.mid_block.attentions.0", c)
    _init_resnet(ini, "decoder.mid_block.resnets.1", c, c)
    rev = list(reversed(chs))
    cin = c
    for i, ch in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            _init_resnet(ini, f"decoder.up_blocks.{i}.resnets.{j}",
                         cin if j == 0 else ch, ch)
        cin = ch
        if i < n - 1:
            ini.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    ini.norm("decoder.conv_norm_out", chs[0])
    ini.conv("decoder.conv_out", chs[0], cfg.out_channels)
    return ini.p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _resnet(p, prefix, x, cfg):
    cin = x.shape[-1]
    h = group_norm(p, prefix + ".norm1", x, cfg.norm_num_groups, EPS)
    h = conv2d(p, prefix + ".conv1", silu(h), padding=(1, 1))
    h = group_norm(p, prefix + ".norm2", h, cfg.norm_num_groups, EPS)
    h = conv2d(p, prefix + ".conv2", silu(h), padding=(1, 1))
    if prefix + ".conv_shortcut.weight" in p:
        x = conv2d(p, prefix + ".conv_shortcut", x)
    return x + h


def _attn(p, prefix, x, cfg):
    """Single-head self-attention over spatial positions (VAE mid block)."""
    B, H, W, C = x.shape
    h = group_norm(p, prefix + ".group_norm", x, cfg.norm_num_groups, EPS)
    h = h.reshape(B, H * W, C)
    q = dense(p, prefix + ".to_q", h)
    k = dense(p, prefix + ".to_k", h)
    v = dense(p, prefix + ".to_v", h)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    att = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
    h = jnp.einsum("bqk,bkc->bqc", att, v)
    h = dense(p, prefix + ".to_out.0", h)
    return x + h.reshape(B, H, W, C)


def vae_encode_moments(p: Params, x: jax.Array, cfg: VAEConfig) -> jax.Array:
    """Image (B,H,W,3) in [-1,1] -> moments (B,h,w,2*latent): mean|logvar."""
    n = len(cfg.block_out_channels)
    h = conv2d(p, "encoder.conv_in", x, padding=(1, 1))
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = _resnet(p, f"encoder.down_blocks.{i}.resnets.{j}", h, cfg)
        if i < n - 1:
            # diffusers Downsample2D in the VAE uses asymmetric (0,1) padding
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(p, f"encoder.down_blocks.{i}.downsamplers.0.conv", h,
                       stride=(2, 2))
    h = _resnet(p, "encoder.mid_block.resnets.0", h, cfg)
    h = _attn(p, "encoder.mid_block.attentions.0", h, cfg)
    h = _resnet(p, "encoder.mid_block.resnets.1", h, cfg)
    h = group_norm(p, "encoder.conv_norm_out", h, cfg.norm_num_groups, EPS)
    h = conv2d(p, "encoder.conv_out", silu(h), padding=(1, 1))
    return conv2d(p, "quant_conv", h)


def vae_sample(moments: jax.Array, rng: jax.Array) -> jax.Array:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def vae_encode(p: Params, x: jax.Array, cfg: VAEConfig, rng: jax.Array,
               sample: bool = True) -> jax.Array:
    """Image -> scaled latent (x scaling_factor), as the trainers use it
    (cli_lora_pti.py:290-292: encode().sample() * 0.18215)."""
    moments = vae_encode_moments(p, x, cfg)
    z = vae_sample(moments, rng) if sample else jnp.split(moments, 2, -1)[0]
    return z * cfg.scaling_factor


def vae_decode(p: Params, z: jax.Array, cfg: VAEConfig) -> jax.Array:
    """Scaled latent -> image (B,H,W,3) in [-1,1]."""
    n = len(cfg.block_out_channels)
    z = z / cfg.scaling_factor
    h = conv2d(p, "post_quant_conv", z)
    h = conv2d(p, "decoder.conv_in", h, padding=(1, 1))
    h = _resnet(p, "decoder.mid_block.resnets.0", h, cfg)
    h = _attn(p, "decoder.mid_block.attentions.0", h, cfg)
    h = _resnet(p, "decoder.mid_block.resnets.1", h, cfg)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(p, f"decoder.up_blocks.{i}.resnets.{j}", h, cfg)
        if i < n - 1:
            h = upsample_nearest_2x(h)
            h = conv2d(p, f"decoder.up_blocks.{i}.upsamplers.0.conv", h,
                       padding=(1, 1))
    h = group_norm(p, "decoder.conv_norm_out", h, cfg.norm_num_groups, EPS)
    h = conv2d(p, "decoder.conv_out", silu(h), padding=(1, 1))
    return h
