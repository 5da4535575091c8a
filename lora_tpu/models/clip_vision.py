"""CLIP ViT vision tower + projection heads, functional JAX.

Completes the in-framework CLIP model so the eval harness
(utils/eval: text/image alignment from the textual-inversion paper,
reference utils.py:73-100) can score without torch. Param keys match the HF
CLIPModel state_dict (including its historical "pre_layrnorm" typo), so a
local openai/clip-vit-large-patch14 checkpoint loads as an identity map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .clip import clip_text_forward
from .config import CLIPTextConfig
from .layers import Params, dense, layer_norm, quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5


CLIP_VIT_L14_VISION = CLIPVisionConfig()
TINY_VISION = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=28, patch_size=14,
                               projection_dim=16)


def init_clip_vision(cfg: CLIPVisionConfig, rng: jax.Array,
                     dtype=jnp.float32) -> Params:
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    keys = iter(jax.random.split(rng, 6 + L * 6))
    p: Params = {}

    def lin(name, i, o, bias=True):
        p[name + ".weight"] = (jax.random.normal(next(keys), (o, i)) * 0.02
                               ).astype(dtype)
        if bias:
            p[name + ".bias"] = jnp.zeros((o,), dtype)

    def ln(name, c=d):
        p[name + ".weight"] = jnp.ones((c,), dtype)
        p[name + ".bias"] = jnp.zeros((c,), dtype)

    p["vision_model.embeddings.class_embedding"] = (
        jax.random.normal(next(keys), (d,)) * 0.02).astype(dtype)
    p["vision_model.embeddings.patch_embedding.weight"] = (
        jax.random.normal(next(keys), (d, 3, cfg.patch_size, cfg.patch_size))
        * 0.02).astype(dtype)
    p["vision_model.embeddings.position_embedding.weight"] = (
        jax.random.normal(next(keys), (n_pos, d)) * 0.02).astype(dtype)
    ln("vision_model.pre_layrnorm")  # HF key name (typo preserved upstream)
    for i in range(L):
        base = f"vision_model.encoder.layers.{i}"
        ln(base + ".layer_norm1")
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            lin(f"{base}.self_attn.{proj}", d, d)
        ln(base + ".layer_norm2")
        lin(base + ".mlp.fc1", d, ff)
        lin(base + ".mlp.fc2", ff, d)
    ln("vision_model.post_layernorm")
    lin("visual_projection", d, cfg.projection_dim, bias=False)
    return p


def clip_vision_forward(params: Params, pixel_values: jax.Array,
                        cfg: CLIPVisionConfig, dtype=jnp.float32) -> jax.Array:
    """pixel_values: (B, H, W, 3) CLIP-normalized. Returns pooled CLS after
    post_layernorm (B, D)."""
    B = pixel_values.shape[0]
    d = cfg.hidden_size
    h = cfg.num_attention_heads
    dh = d // h

    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(dtype),
        params["vision_model.embeddings.patch_embedding.weight"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    patches = patches.reshape(B, -1, d)
    cls = jnp.broadcast_to(
        params["vision_model.embeddings.class_embedding"].astype(dtype),
        (B, 1, d))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["vision_model.embeddings.position_embedding.weight"][
        : x.shape[1]].astype(dtype)
    x = layer_norm(params, "vision_model.pre_layrnorm", x, cfg.layer_norm_eps)

    def heads(y):
        return y.reshape(B, -1, h, dh).transpose(0, 2, 1, 3)

    def unheads(y):
        return y.transpose(0, 2, 1, 3).reshape(B, -1, d)

    for i in range(cfg.num_hidden_layers):
        base = f"vision_model.encoder.layers.{i}"
        res = x
        y = layer_norm(params, base + ".layer_norm1", x, cfg.layer_norm_eps)
        sa = base + ".self_attn"
        att = unheads(attention(heads(dense(params, sa + ".q_proj", y)),
                                heads(dense(params, sa + ".k_proj", y)),
                                heads(dense(params, sa + ".v_proj", y))))
        x = res + dense(params, sa + ".out_proj", att)
        res = x
        y = layer_norm(params, base + ".layer_norm2", x, cfg.layer_norm_eps)
        x = res + dense(params, base + ".mlp.fc2",
                        quick_gelu(dense(params, base + ".mlp.fc1", y)))

    pooled = x[:, 0]
    return layer_norm(params, "vision_model.post_layernorm", pooled[:, None],
                      cfg.layer_norm_eps)[:, 0]


def get_image_features(params: Params, pixel_values: jax.Array,
                       cfg: CLIPVisionConfig) -> jax.Array:
    pooled = clip_vision_forward(params, pixel_values, cfg)
    return pooled @ params["visual_projection.weight"].astype(pooled.dtype).T


def get_text_features(params: Params, input_ids: jax.Array,
                      text_cfg: CLIPTextConfig) -> jax.Array:
    """EOS-pooled text features through text_projection (CLIPModel
    semantics: pool at the EOS/argmax token position)."""
    hidden = clip_text_forward(params, input_ids, text_cfg)
    eos_pos = jnp.argmax(input_ids, axis=-1)
    pooled = hidden[jnp.arange(hidden.shape[0]), eos_pos]
    return pooled @ params["text_projection.weight"].astype(pooled.dtype).T


CLIP_IMAGE_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_IMAGE_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def preprocess_images(images, image_size: int = 224) -> jax.Array:
    """PIL list / uint8 array (B,H,W,3) -> CLIP-normalized (B,S,S,3)."""
    import numpy as np
    from PIL import Image

    out = []
    for img in images:
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        img = img.convert("RGB").resize((image_size, image_size),
                                        Image.BICUBIC)
        out.append(np.asarray(img, np.float32) / 255.0)
    arr = jnp.asarray(np.stack(out))
    return (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
