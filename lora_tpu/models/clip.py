"""CLIP ViT-L/14 text encoder, functional JAX.

Replaces the reference's `transformers.CLIPTextModel` dependency
(cli_lora_pti.py:58-68).  Pre-LN transformer with causal mask and
quick-GELU, final LayerNorm; param names match the HF state_dict
("text_model.encoder.layers.{i}.self_attn.k_proj.weight", ...) so import
is an identity mapping.

Textual inversion uses a fixed-size extra-embedding buffer instead of the
reference's `resize_token_embeddings` (lora.py:937) — mutable vocabulary
doesn't exist under jit; rows are scattered over the base table at forward
time and the buffer is the trainable leaf.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .config import CLIPTextConfig
from .layers import dense, gelu, layer_norm, quick_gelu

Params = Dict[str, jax.Array]

# hidden_act values published in the SD text-encoder configs
_ACTS = {"quick_gelu": quick_gelu, "gelu": gelu}


def init_clip_text(cfg: CLIPTextConfig, rng: jax.Array,
                   dtype=jnp.float32) -> Params:
    """Random-init params (pretrained weights come from hf_import)."""
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    keys = iter(jax.random.split(rng, 4 + L * 6))
    p: Params = {}

    def lin(name, i, o, std=0.02):
        p[name + ".weight"] = (jax.random.normal(next(keys), (o, i)) * std).astype(dtype)
        p[name + ".bias"] = jnp.zeros((o,), dtype)

    def ln(name):
        p[name + ".weight"] = jnp.ones((d,), dtype)
        p[name + ".bias"] = jnp.zeros((d,), dtype)

    p["text_model.embeddings.token_embedding.weight"] = (
        jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02
    ).astype(dtype)
    p["text_model.embeddings.position_embedding.weight"] = (
        jax.random.normal(next(keys), (cfg.max_position_embeddings, d)) * 0.01
    ).astype(dtype)
    for i in range(L):
        base = f"text_model.encoder.layers.{i}"
        ln(base + ".layer_norm1")
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            lin(f"{base}.self_attn.{proj}", d, d)
        ln(base + ".layer_norm2")
        lin(base + ".mlp.fc1", d, ff)
        lin(base + ".mlp.fc2", ff, d)
    ln("text_model.final_layer_norm")
    if cfg.projection_dim is not None:
        # CLIPTextModelWithProjection (SDXL text_encoder_2): bias-free
        p["text_projection.weight"] = (
            jax.random.normal(jax.random.fold_in(rng, 7),
                              (cfg.projection_dim, d)) * d ** -0.5
        ).astype(dtype)
    return p


def apply_ti(
    params: Params,
    ti_embeds: Optional[jax.Array],
    ti_ids: Optional[jax.Array],
) -> jax.Array:
    """Return the token-embedding table with TI rows written in.

    ti_embeds: (K, D) trainable buffer; ti_ids: (K,) int32 token ids
    (inactive slots should carry id 0 with embeds equal to row 0, or be
    masked by the caller). Differentiable w.r.t. ti_embeds."""
    table = params["text_model.embeddings.token_embedding.weight"]
    if ti_embeds is None:
        return table
    return table.at[ti_ids].set(ti_embeds.astype(table.dtype))


def clip_text_forward(
    params: Params,
    input_ids: jax.Array,  # (B, T) int32
    cfg: CLIPTextConfig,
    lora=None,
    ti_embeds: Optional[jax.Array] = None,
    ti_ids: Optional[jax.Array] = None,
    dtype=jnp.float32,
    penultimate: bool = False,
    pooled_eos_id: Optional[int] = None,
) -> jax.Array:
    """Returns last_hidden_state (B, T, D) after the final LayerNorm —
    exactly what SD's conditioning consumes (text_encoder(ids)[0]).

    penultimate=True returns the SECOND-TO-LAST layer's hidden state with
    no final LayerNorm (HF output_hidden_states[-2] — SDXL's conditioning
    for both encoders; equivalently webui "clip skip 2").

    pooled_eos_id: when set, returns (hidden, pooled) where pooled is the
    full-depth final-normed state at each row's FIRST eos position, passed
    through text_projection if the config declares one (HF
    CLIPTextModelWithProjection.text_embeds — SDXL's add_embedding input)."""
    B, T = input_ids.shape
    d = cfg.hidden_size
    h = cfg.num_attention_heads
    dh = d // h
    # SD1.x CLIP ViT-L uses quick_gelu; SD2.x's OpenCLIP ViT-H export uses
    # plain gelu (text_encoder/config.json hidden_act)
    act = _ACTS[cfg.hidden_act]

    table = apply_ti(params, ti_embeds, ti_ids)
    pos = params["text_model.embeddings.position_embedding.weight"][:T]
    x = (table[input_ids] + pos[None]).astype(dtype)

    def heads(y):  # (B, T, D) -> (B, h, T, dh)
        return y.reshape(B, T, h, dh).transpose(0, 2, 1, 3)

    def unheads(y):
        return y.transpose(0, 2, 1, 3).reshape(B, T, d)

    penult = None
    for i in range(cfg.num_hidden_layers):
        if i == cfg.num_hidden_layers - 1:
            penult = x  # input to the last layer = hidden_states[-2]
            if penultimate and pooled_eos_id is None:
                break  # the last layer's output is never consumed
        base = f"text_model.encoder.layers.{i}"
        res = x
        y = layer_norm(params, base + ".layer_norm1", x, cfg.layer_norm_eps)
        sa = base + ".self_attn"
        q = heads(dense(params, sa + ".q_proj", y, lora))
        k = heads(dense(params, sa + ".k_proj", y, lora))
        v = heads(dense(params, sa + ".v_proj", y, lora))
        att = unheads(attention(q, k, v, causal=True))
        x = res + dense(params, sa + ".out_proj", att, lora)

        res = x
        y = layer_norm(params, base + ".layer_norm2", x, cfg.layer_norm_eps)
        y = act(dense(params, base + ".mlp.fc1", y, lora))
        x = res + dense(params, base + ".mlp.fc2", y, lora)

    hidden = (penult if penultimate
              else layer_norm(params, "text_model.final_layer_norm", x,
                              cfg.layer_norm_eps))
    if pooled_eos_id is None:
        return hidden
    final = layer_norm(params, "text_model.final_layer_norm", x,
                       cfg.layer_norm_eps)
    # first eos occurrence per row (robust to TI tokens with ids above eos,
    # unlike the legacy argmax(input_ids) pooling)
    eos_pos = jnp.argmax((input_ids == pooled_eos_id).astype(jnp.int32),
                         axis=-1)
    pooled = final[jnp.arange(B), eos_pos]
    if "text_projection.weight" in params:
        pooled = pooled @ params["text_projection.weight"].astype(
            pooled.dtype).T
    return hidden, pooled
