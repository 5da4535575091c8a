"""SDXL topology support: 3-level UNet with per-block transformer depth,
"text_time" additive conditioning (add_embedding), and the dual text
encoders (CLIP ViT-L penultimate + OpenCLIP ViT-bigG penultimate/pooled
projection).

The reference predates SDXL entirely; this is migration-surface work for
users bringing SDXL checkpoints/LoRAs (same rationale as formats/kohya.py).
The text-encoder semantics are pinned against the installed transformers
CLIPTextModelWithProjection as an independent oracle; the UNet deltas are
pinned structurally and against closed-form numpy for the add_embedding
path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import init_lora
from lora_tpu.core.sites import unet_locon_sites, unet_lora_sites
from lora_tpu.models.clip import clip_text_forward, init_clip_text
from lora_tpu.models.config import (
    SDXL_TEXT2,
    SDXL_UNET,
    TINY_XL_TEXT2,
    TINY_XL_UNET,
)
from lora_tpu.models.layers import timestep_embedding
from lora_tpu.models.unet import init_unet, unet_forward


@pytest.fixture(scope="module")
def xl_params():
    return init_unet(TINY_XL_UNET, jax.random.PRNGKey(3))


def test_sdxl_config_constants():
    """The published stabilityai/stable-diffusion-xl-base-1.0 facts."""
    assert SDXL_UNET.block_out_channels == (320, 640, 1280)
    assert SDXL_UNET.down_block_has_attn == (False, True, True)
    assert SDXL_UNET.up_block_has_attn == (True, True, False)
    assert SDXL_UNET.transformer_layers == (1, 2, 10)
    # constant head dim 64 on the attention levels
    for i in (1, 2):
        assert (SDXL_UNET.block_out_channels[i]
                // SDXL_UNET.heads_for_block(i) == 64)
    assert SDXL_UNET.cross_attention_dim == 2048  # 768 (ViT-L) + 1280 (bigG)
    assert SDXL_UNET.addition_embed_type == "text_time"
    # pooled (1280) + 6 time_ids x 256-wide sinusoids
    assert (SDXL_UNET.projection_class_embeddings_input_dim
            == 1280 + 6 * SDXL_UNET.addition_time_embed_dim)
    assert SDXL_TEXT2.projection_dim == 1280
    assert SDXL_TEXT2.num_hidden_layers == 32


def test_param_topology(xl_params):
    p = xl_params
    # per-block transformer depth: (1, 1, 2) in the tiny config
    assert "down_blocks.2.attentions.0.transformer_blocks.1.attn1.to_q.weight" in p
    assert "down_blocks.1.attentions.0.transformer_blocks.1.attn1.to_q.weight" not in p
    assert "mid_block.attentions.0.transformer_blocks.1.attn1.to_q.weight" in p
    # the first down block / last up block are attention-free
    assert not any(k.startswith("down_blocks.0.attentions") for k in p)
    assert not any(k.startswith("up_blocks.2.attentions") for k in p)
    # up block 0 mirrors down block 2's depth
    assert "up_blocks.0.attentions.0.transformer_blocks.1.attn1.to_q.weight" in p
    # the text_time MLP
    c0 = TINY_XL_UNET.block_out_channels[0]
    w1 = p["add_embedding.linear_1.weight"]
    assert w1.shape == (4 * c0,
                        TINY_XL_UNET.projection_class_embeddings_input_dim)
    assert p["add_embedding.linear_2.weight"].shape == (4 * c0, 4 * c0)


def _added(B, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "text_embeds": jnp.asarray(rs.randn(B, 28), jnp.float32),
        "time_ids": jnp.asarray(
            np.tile([512, 512, 0, 0, 512, 512], (B, 1)), jnp.float32),
    }


def test_forward_shape_and_jit(xl_params):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    t = jnp.array([7, 500])
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 6, 44), jnp.float32)
    fn = jax.jit(lambda p, x, t, c, a: unet_forward(
        p, x, t, c, TINY_XL_UNET, added_cond=a))
    out = fn(xl_params, x, t, ctx, _added(2))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_added_cond_required_iff_declared(xl_params):
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ctx = jnp.zeros((1, 4, 44))
    with pytest.raises(ValueError, match="added_cond"):
        unet_forward(xl_params, x, t, ctx, TINY_XL_UNET)
    from lora_tpu.models.config import TINY_UNET

    p15 = init_unet(TINY_UNET, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="added_cond"):
        unet_forward(p15, x, t, jnp.zeros((1, 4, 32)), TINY_UNET,
                     added_cond=_added(1))


def test_added_cond_closed_form(xl_params):
    """The text_time path must equal silu-MLP(concat[pooled | sinusoidal
    time_ids]) added to temb — verified by zeroing it: a forward whose
    add_embedding output is algebraically zero equals a forward where the
    addition branch contributes nothing."""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 4), jnp.float32)
    t = jnp.array([300])
    ctx = jnp.asarray(np.random.RandomState(3).randn(1, 4, 44), jnp.float32)
    a = _added(1, seed=5)
    base = unet_forward(xl_params, x, t, ctx, TINY_XL_UNET, added_cond=a)

    # independently compute the expected aug vector in numpy and bake it
    # into the time_embedding bias; zero out add_embedding -> same output
    te = np.asarray(timestep_embedding(
        a["time_ids"].reshape(-1), TINY_XL_UNET.addition_time_embed_dim,
        flip_sin_to_cos=True, freq_shift=0)).reshape(1, -1)
    cat = np.concatenate([np.asarray(a["text_embeds"]), te], -1)
    w1 = np.asarray(xl_params["add_embedding.linear_1.weight"])
    b1 = np.asarray(xl_params["add_embedding.linear_1.bias"])
    w2 = np.asarray(xl_params["add_embedding.linear_2.weight"])
    b2 = np.asarray(xl_params["add_embedding.linear_2.bias"])
    h = cat @ w1.T + b1
    h = h * (1.0 / (1.0 + np.exp(-h)))  # silu
    aug = h @ w2.T + b2

    p2 = dict(xl_params)
    p2["add_embedding.linear_1.weight"] = jnp.zeros_like(
        xl_params["add_embedding.linear_1.weight"])
    p2["add_embedding.linear_1.bias"] = jnp.zeros_like(b1)
    p2["add_embedding.linear_2.weight"] = jnp.zeros_like(w2)
    p2["add_embedding.linear_2.bias"] = jnp.zeros_like(b2)
    p2["time_embedding.linear_2.bias"] = (
        xl_params["time_embedding.linear_2.bias"] + jnp.asarray(aug[0]))
    redone = unet_forward(p2, x, t, ctx, TINY_XL_UNET, added_cond=a)
    np.testing.assert_allclose(np.asarray(redone), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


def test_lora_sites_cover_xl_topology(xl_params):
    sites = unet_lora_sites(TINY_XL_UNET)
    assert all(s.name + ".weight" in xl_params for s in sites)
    # depth-2 block contributes 2 transformer blocks' worth of attn sites
    deep = [s for s in sites
            if s.name.startswith("down_blocks.2.attentions.0.")]
    assert {s.name.split(".")[4] for s in deep} == {"transformer_blocks"}
    assert len([s for s in deep if ".transformer_blocks.1." in s.name]) == 9
    locon = unet_locon_sites(TINY_XL_UNET)
    assert all(s.name + ".weight" in xl_params for s in locon)
    lora = init_lora(sites, r=2, rng=jax.random.PRNGKey(0))
    x = jnp.zeros((1, 8, 8, 4))
    out = unet_forward(xl_params, x, jnp.array([1]), jnp.zeros((1, 4, 44)),
                       TINY_XL_UNET, lora=lora, added_cond=_added(1))
    assert out.shape == (1, 8, 8, 4)


def test_grad_flows_through_add_embedding(xl_params):
    x = jnp.asarray(np.random.RandomState(4).randn(1, 8, 8, 4), jnp.float32)

    def loss(p):
        out = unet_forward(p, x, jnp.array([10]), jnp.zeros((1, 4, 44)),
                           TINY_XL_UNET, added_cond=_added(1))
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(xl_params)
    assert float(jnp.abs(g["add_embedding.linear_1.weight"]).max()) > 0


# ---------------------------------------------------------------------------
# text encoder 2: penultimate + pooled projection vs transformers oracle
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_proj_and_ours():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=500, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="gelu",
        attention_dropout=0.0, projection_dim=48,
        # eos != 2 engages HF's FIXED first-eos pooling path (eos_token_id
        # == 2 keeps its legacy argmax(input_ids) back-compat quirk, which
        # breaks once any id above eos — e.g. an added TI token — appears;
        # we implement the fixed semantics, see clip_text_forward)
        eos_token_id=3, bos_token_id=1, pad_token_id=0,
    )
    torch.manual_seed(11)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()
              if not k.endswith("position_ids")}
    from lora_tpu.models.config import CLIPTextConfig

    ours_cfg = CLIPTextConfig(
        vocab_size=500, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="gelu", projection_dim=48)
    return model, params, ours_cfg


def test_penultimate_and_pooled_match_hf(hf_proj_and_ours):
    torch = pytest.importorskip("torch")
    model, params, cfg = hf_proj_and_ours
    # rows end with eos (id 3) then pads; rows carry ids ABOVE eos
    # (TI-style tokens) to pin first-eos pooling over legacy argmax
    ids = np.array([[1, 499, 17, 230, 3, 0, 0, 0],
                    [1, 88, 7, 42, 9, 11, 3, 0]], np.int64)
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    ref_pen = out.hidden_states[-2].numpy()
    ref_pooled = out.text_embeds.numpy()
    hidden, pooled = clip_text_forward(
        params, jnp.asarray(ids), cfg, penultimate=True, pooled_eos_id=3)
    np.testing.assert_allclose(np.asarray(hidden), ref_pen,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=2e-4, atol=2e-5)


def test_penultimate_is_not_last(hf_proj_and_ours):
    _, params, cfg = hf_proj_and_ours
    ids = jnp.asarray(np.array([[1, 5, 2, 0]], np.int64))
    last = clip_text_forward(params, ids, cfg)
    pen = clip_text_forward(params, ids, cfg, penultimate=True)
    assert np.abs(np.asarray(last) - np.asarray(pen)).max() > 1e-3


def test_projection_init_shape():
    p = init_clip_text(TINY_XL_TEXT2, jax.random.PRNGKey(0))
    assert p["text_projection.weight"].shape == (
        TINY_XL_TEXT2.projection_dim, TINY_XL_TEXT2.hidden_size)


# ---------------------------------------------------------------------------
# SDXL kohya schema: LDM unet names + lora_te1_/lora_te2_ prefixes
# ---------------------------------------------------------------------------

def test_xl_unet_ldm_key_mapping():
    """The community's SDXL kohya keys use the ORIGINAL LDM module layout;
    spot-check ours against well-known key spellings on the REAL config."""
    from lora_tpu.formats.kohya import _xl_unet_index

    idx = _xl_unet_index(unet_locon_sites(SDXL_UNET), SDXL_UNET)
    names = {k: s.name for k, s in idx.items()}
    # down block 1's first attention module lives at input_blocks.4.1
    assert (names["lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q"]
            == "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q")
    # the mid transformer is middle_block.1; its 10th block exists
    assert (names["lora_unet_middle_block_1_transformer_blocks_9_attn2_to_k"]
            == "mid_block.attentions.0.transformer_blocks.9.attn2.to_k")
    # up block 0 (deepest, has attention + upsampler): conv after attn = .2
    assert (names["lora_unet_output_blocks_2_2_conv"]
            == "up_blocks.0.upsamplers.0.conv")
    # resnet conv (LoCon targets) spell as in_layers/out_layers
    assert (names["lora_unet_input_blocks_1_0_in_layers_2"]
            == "down_blocks.0.resnets.0.conv1")
    assert (names["lora_unet_input_blocks_3_0_op"]
            == "down_blocks.0.downsamplers.0.conv")


def _xl_loras(seed=0):
    from lora_tpu.core.sites import text_encoder_locon_sites
    from lora_tpu.models.config import TINY_XL_TEXT

    usites = unet_locon_sites(TINY_XL_UNET)
    t1 = text_encoder_locon_sites(TINY_XL_TEXT)
    t2 = text_encoder_locon_sites(TINY_XL_TEXT2)
    out = []
    for sites, k in ((usites, seed), (t1, seed + 1), (t2, seed + 2)):
        l = init_lora(sites, r=2, rng=jax.random.PRNGKey(k))
        ks = jax.random.split(jax.random.PRNGKey(k + 10), len(l["sites"]))
        for (n, e), kk in zip(sorted(l["sites"].items()), ks):
            e["up"] = jax.random.normal(kk, e["up"].shape) * 0.2
        out.append((l, sites))
    return out


def test_kohya_xl_round_trip(tmp_path):
    from lora_tpu.formats.kohya import (
        is_kohya_xl,
        load_kohya_xl,
        save_kohya_xl,
    )
    from lora_tpu.formats.reader import SafetensorsFile

    (lu, usites), (lt1, t1), (lt2, t2) = _xl_loras()
    p = str(tmp_path / "xl.safetensors")
    save_kohya_xl(p, unet_cfg=TINY_XL_UNET, lora_unet=lu, unet_sites=usites,
                  lora_text=lt1, text_sites=t1, lora_text2=lt2,
                  text2_sites=t2, dtype=np.float32)
    with SafetensorsFile(p) as f:
        keys = list(f.keys())
    assert is_kohya_xl(keys)
    assert any(k.startswith("lora_unet_input_blocks_") for k in keys)
    assert any(k.startswith("lora_te1_") for k in keys)
    assert any(k.startswith("lora_te2_") for k in keys)
    assert not any(k.startswith("lora_te_t") for k in keys)
    ru, r1, r2 = load_kohya_xl(p, unet_cfg=TINY_XL_UNET, unet_sites=usites,
                               text_sites=t1, text2_sites=t2)
    for orig, got in ((lu, ru), (lt1, r1), (lt2, r2)):
        assert set(orig["sites"]) == set(got["sites"])
        for n in orig["sites"]:
            np.testing.assert_allclose(
                np.asarray(got["sites"][n]["up"], np.float32),
                np.asarray(orig["sites"][n]["up"], np.float32),
                rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(got["sites"][n]["down"], np.float32),
                np.asarray(orig["sites"][n]["down"], np.float32),
                rtol=1e-6, atol=1e-6)


def test_kohya_xl_rejects_unknown_prefix(tmp_path):
    from lora_tpu.formats.kohya import load_kohya_xl
    from lora_tpu.formats.reader import save_file

    p = str(tmp_path / "bad.safetensors")
    save_file({"lora_refiner_foo.lora_up.weight": np.zeros((2, 2),
                                                           np.float32)}, p)
    with pytest.raises(ValueError, match="unknown prefixes"):
        load_kohya_xl(p, unet_cfg=TINY_XL_UNET,
                      unet_sites=unet_locon_sites(TINY_XL_UNET))


def test_plain_kohya_loader_rejects_xl_file(tmp_path):
    """SD1.x load_kohya must not silently skip te1/te2 modules."""
    from lora_tpu.formats.kohya import load_kohya, save_kohya_xl

    (lu, usites), (lt1, t1), (lt2, t2) = _xl_loras(seed=5)
    p = str(tmp_path / "xl.safetensors")
    save_kohya_xl(p, unet_cfg=TINY_XL_UNET, lora_unet=lu, unet_sites=usites,
                  lora_text=lt1, text_sites=t1, lora_text2=lt2,
                  text2_sites=t2)
    with pytest.raises(ValueError):
        load_kohya(p, unet_sites=usites, text_sites=t1)
