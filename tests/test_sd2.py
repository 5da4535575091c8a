"""SD-2.x topology support: per-block head counts, linear transformer
projections (use_linear_projection), gelu text encoder, v-prediction.

The reference trains SD-2.x through the same scripts (any diffusers dir via
--pretrained_model_name_or_path; the v_prediction branch at
cli_lora_pti.py:336 exists exactly for the 768-v models). These tests pin
the SD2 architectural deltas against independent implementations — the
torch oracle for the UNet and transformers' CLIPTextModel for the text
encoder — on SD2-flavored tiny configs (TINY_SD2_*).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from lora_tpu.formats.ckpt_export import convert_to_ckpt
from lora_tpu.models.config import (
    SD21_TEXT,
    SD21_UNET,
    TINY_SD2_TEXT,
    TINY_SD2_UNET,
    TINY_VAE,
)
from lora_tpu.models.unet import unet_forward
from lora_tpu.pipelines.sd import StableDiffusionPipeline

HEAD_DIM = 16  # TINY_SD2_UNET: (32, 64, 64, 64) ch / (2, 4, 4, 4) heads


@pytest.fixture(scope="module")
def sd2_pipe():
    return StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(19), unet_cfg=TINY_SD2_UNET,
        text_cfg=TINY_SD2_TEXT, vae_cfg=TINY_VAE)


@pytest.fixture(scope="module")
def sd2_unet_sd(sd2_pipe, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "sd2.ckpt")
    convert_to_ckpt(sd2_pipe, path, as_half=False)
    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    return {k[len("model.diffusion_model."):]: v for k, v in sd.items()
            if k.startswith("model.diffusion_model.")}


def test_sd21_config_constants():
    """The published stabilityai/stable-diffusion-2-1 architecture facts."""
    assert SD21_UNET.num_attention_heads == (5, 10, 20, 20)
    # constant head dim 64 across the U
    for i, ch in enumerate(SD21_UNET.block_out_channels):
        if SD21_UNET.down_block_has_attn[i]:
            assert ch // SD21_UNET.heads_for_block(i) == 64
    assert SD21_UNET.use_linear_projection
    assert SD21_UNET.cross_attention_dim == 1024
    assert SD21_TEXT.hidden_size == 1024
    assert SD21_TEXT.num_hidden_layers == 23  # penultimate-layer truncation
    assert SD21_TEXT.hidden_act == "gelu"


def test_linear_proj_params_are_2d(sd2_pipe):
    p = sd2_pipe.unet_params
    assert p["down_blocks.0.attentions.0.proj_in.weight"].ndim == 2
    assert p["mid_block.attentions.0.proj_out.weight"].ndim == 2


def test_per_block_heads_mirror_on_up_path():
    from lora_tpu.models import structure

    downs = structure.down_blocks(TINY_SD2_UNET)
    ups = structure.up_blocks(TINY_SD2_UNET)
    down_heads = [b.attentions[0].num_heads for b in downs
                  if b.attentions[0] is not None]
    up_heads = [b.attentions[0].num_heads for b in ups
                if b.attentions[0] is not None]
    assert down_heads == list(reversed(up_heads))
    for b in downs + ups + [structure.mid_block(TINY_SD2_UNET)]:
        for a in b.attentions:
            if a is not None:
                assert a.channels // a.num_heads == HEAD_DIM
                assert a.linear_proj


def test_sd2_unet_matches_torch_oracle(sd2_pipe, sd2_unet_sd):
    """Per-block heads + linear projections vs the independent oracle (which
    detects linear proj from the checkpoint weight rank and derives the
    per-level head count from the constant head dim)."""
    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 16
    x = rng.randn(B, H, W, TINY_SD2_UNET.in_channels).astype(np.float32)
    t = np.array([11.0, 800.0], np.float32)
    ctx = rng.randn(B, 5, TINY_SD2_UNET.cross_attention_dim).astype(np.float32)

    ours = unet_forward(sd2_pipe.unet_params, jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(ctx), TINY_SD2_UNET)
    with torch.no_grad():
        ref = oracle.unet_forward(
            sd2_unet_sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t), torch.from_numpy(ctx),
            groups=TINY_SD2_UNET.norm_num_groups, head_dim=HEAD_DIM)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=2e-4)


def test_sd2_clip_gelu_matches_hf(sd2_pipe):
    """hidden_act='gelu' (OpenCLIP ViT-H export) vs transformers."""
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel

    hf_cfg = HFTextConfig(
        vocab_size=TINY_SD2_TEXT.vocab_size,
        hidden_size=TINY_SD2_TEXT.hidden_size,
        intermediate_size=TINY_SD2_TEXT.intermediate_size,
        num_hidden_layers=TINY_SD2_TEXT.num_hidden_layers,
        num_attention_heads=TINY_SD2_TEXT.num_attention_heads,
        max_position_embeddings=TINY_SD2_TEXT.max_position_embeddings,
        hidden_act="gelu", attention_dropout=0.0)
    model = CLIPTextModel(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in sd2_pipe.text_params.items()}, strict=False)
    assert not unexpected
    assert all("position_ids" in k for k in missing)

    ids = np.asarray(sd2_pipe.tokenizer(["a tiny town"])["input_ids"],
                     np.int64)
    ours = np.asarray(sd2_pipe.encode_prompt("a tiny town"))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_sd2_pipeline_export_reload_roundtrip(sd2_pipe, tmp_path):
    """save_pipeline_params writes attention_head_dim as the per-block list
    + use_linear_projection, and from_pretrained reconstructs the identical
    config and forward."""
    from lora_tpu.models.hf_import import save_pipeline_params

    d = str(tmp_path / "sd2_dir")
    save_pipeline_params(sd2_pipe, d)
    pipe2 = StableDiffusionPipeline.from_pretrained(
        d, require_real_tokenizer=False,
        tokenizer=sd2_pipe.tokenizer)
    assert pipe2.unet_cfg == TINY_SD2_UNET
    assert pipe2.text_cfg.hidden_act == "gelu"

    rng = np.random.RandomState(2)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    ctx = rng.randn(1, 5, TINY_SD2_UNET.cross_attention_dim).astype(np.float32)
    t = np.array([42.0], np.float32)
    a = unet_forward(sd2_pipe.unet_params, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(ctx), sd2_pipe.unet_cfg)
    b = unet_forward(pipe2.unet_params, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(ctx), pipe2.unet_cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sd2_lora_sites_and_locon_proj_kind():
    """The reference-format site registry works unchanged on SD2 (attention
    dims key off channels, not heads); the LoCon proj_in/proj_out sites
    switch to linear geometry under use_linear_projection."""
    from lora_tpu.core.sites import unet_locon_sites, unet_lora_sites

    sites = unet_lora_sites(TINY_SD2_UNET)
    assert sites, "no sites"
    ks = {s.name: s for s in unet_locon_sites(TINY_SD2_UNET)}
    pi = ks["down_blocks.0.attentions.0.proj_in"]
    po = ks["mid_block.attentions.0.proj_out"]
    assert pi.kind == "linear" and po.kind == "linear"
    # SD1.5 stays conv
    from lora_tpu.models.config import TINY_UNET

    ks15 = {s.name: s for s in unet_locon_sites(TINY_UNET)}
    assert ks15["down_blocks.0.attentions.0.proj_in"].kind == "conv"


def test_sd2_lora_zero_init_forward_unchanged(sd2_pipe):
    """Zero-init up => forward identical, including through the linear
    proj_in/proj_out LoCon sites (the dense path must accept them)."""
    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import unet_locon_sites

    lora = init_lora(unet_locon_sites(TINY_SD2_UNET), r=2,
                     rng=jax.random.PRNGKey(3))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.asarray(np.array([9.0], np.float32))
    ctx = jnp.asarray(
        rng.randn(1, 5, TINY_SD2_UNET.cross_attention_dim).astype(np.float32))
    base = unet_forward(sd2_pipe.unet_params, x, t, ctx, TINY_SD2_UNET)
    with_lora = unet_forward(sd2_pipe.unet_params, x, t, ctx, TINY_SD2_UNET,
                             lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               atol=1e-6)
    # nonzero ups must move the output (the sites are actually live)
    for n, e in lora["sites"].items():
        e["up"] = jnp.ones_like(e["up"]) * 0.05
    moved = unet_forward(sd2_pipe.unet_params, x, t, ctx, TINY_SD2_UNET,
                         lora=lora)
    assert np.abs(np.asarray(moved) - np.asarray(base)).max() > 1e-4


def test_sd2_v_prediction_train_step(sd2_pipe):
    """One jitted train step on the SD2 topology with the 768-v objective:
    finite loss and the LoRA pytree actually moves."""
    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import unet_lora_sites
    from lora_tpu.models import schedulers
    from lora_tpu.training.loss import LossConfig
    from lora_tpu.training.optim import make_optimizer
    from lora_tpu.training.train_step import make_train_step

    sched = schedulers.make_schedule(prediction_type="v_prediction")
    trainable = {"lora_unet": init_lora(unet_lora_sites(TINY_SD2_UNET), r=2,
                                        rng=jax.random.PRNGKey(8))}
    opt = make_optimizer(trainable, {"lora_unet": 1e-3})
    step = make_train_step(
        unet_cfg=TINY_SD2_UNET, text_cfg=TINY_SD2_TEXT, vae_cfg=TINY_VAE,
        sched=sched, loss_cfg=LossConfig(cached_latents=True), optimizer=opt,
        dtype=jnp.float32)
    rng = np.random.RandomState(6)
    batch = {
        "latents": jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)),
        "encoder_hidden_states": jnp.asarray(
            rng.randn(1, 77, TINY_SD2_UNET.cross_attention_dim)
            .astype(np.float32)),
    }
    base = (sd2_pipe.unet_params, sd2_pipe.text_params, {})
    state = opt.init(trainable)
    # the step donates (trainable, state) — snapshot before values on host
    before = {n: np.asarray(e["down"])
              for n, e in trainable["lora_unet"]["sites"].items()}
    new_tr, _, loss = step(trainable, state, base, batch,
                           jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    after = new_tr["lora_unet"]["sites"]
    moved = max(float(np.abs(np.asarray(after[n]["down"]) - before[n]).max())
                for n in before)
    assert moved > 0.0
