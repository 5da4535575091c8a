"""StableDiffusionXLPipeline end-to-end on tiny configs: dual-encoder
conditioning, text_time micro-conditioning, kohya-XL patching, collapse
equivalence, img2img, and the diffusers-layout save/load round trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import init_lora
from lora_tpu.core.sites import text_encoder_locon_sites, unet_locon_sites
from lora_tpu.formats.kohya import save_kohya_xl
from lora_tpu.models.config import (
    TINY_VAE,
    TINY_XL_TEXT,
    TINY_XL_TEXT2,
    TINY_XL_UNET,
)
from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)


def xl_lora_file(tmp_path, seed=0):
    usites = unet_locon_sites(TINY_XL_UNET)
    t1 = text_encoder_locon_sites(TINY_XL_TEXT)
    t2 = text_encoder_locon_sites(TINY_XL_TEXT2)
    loras = []
    for sites, k in ((usites, seed), (t1, seed + 1), (t2, seed + 2)):
        l = init_lora(sites, r=2, rng=jax.random.PRNGKey(k))
        ks = jax.random.split(jax.random.PRNGKey(k + 10), len(l["sites"]))
        for (n, e), kk in zip(sorted(l["sites"].items()), ks):
            e["up"] = jax.random.normal(kk, e["up"].shape) * 0.2
        loras.append(l)
    p = str(tmp_path / f"xl{seed}.safetensors")
    save_kohya_xl(p, unet_cfg=TINY_XL_UNET, lora_unet=loras[0],
                  unet_sites=usites, lora_text=loras[1], text_sites=t1,
                  lora_text2=loras[2], text2_sites=t2, dtype=np.float32)
    return p


def test_txt2img_shapes_and_determinism(pipe):
    a = pipe("a cat", num_inference_steps=2, height=32, width=32,
             rng=jax.random.PRNGKey(1))
    b = pipe("a cat", num_inference_steps=2, height=32, width=32,
             rng=jax.random.PRNGKey(1))
    assert a.shape == (1, 32, 32, 3)
    assert np.isfinite(a).all() and (a >= 0).all() and (a <= 1).all()
    np.testing.assert_array_equal(a, b)


def test_dual_encoder_conditioning_shapes(pipe):
    ctx, pooled = pipe.encode_prompt_xl(["a cat", "a dog"])
    d = TINY_XL_TEXT.hidden_size + TINY_XL_TEXT2.hidden_size
    assert ctx.shape == (2, 77, d)
    assert pooled.shape == (2, TINY_XL_TEXT2.projection_dim)


def test_second_prompt_changes_te2_half(pipe):
    """The te2 share of the context must react to the prompt (i.e. the
    concat really carries both encoders)."""
    c1, p1 = pipe.encode_prompt_xl("a cat")
    c2, p2 = pipe.encode_prompt_xl("a dog")
    d1 = TINY_XL_TEXT.hidden_size
    assert np.abs(np.asarray(c1[..., :d1]) - np.asarray(c2[..., :d1])).max() > 0
    assert np.abs(np.asarray(c1[..., d1:]) - np.asarray(c2[..., d1:])).max() > 0
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() > 0


def test_micro_conditioning_changes_output(pipe):
    """Different original_size time_ids must change the image — the
    add_embedding path is live, not decorative."""
    a = pipe("a cat", num_inference_steps=2, height=32, width=32,
             rng=jax.random.PRNGKey(2))
    b = pipe("a cat", num_inference_steps=2, height=32, width=32,
             rng=jax.random.PRNGKey(2), original_size=(2048, 2048),
             crops_coords_top_left=(7, 3))
    assert np.abs(a - b).max() > 1e-4


def test_patch_scale_collapse_cycle(pipe, tmp_path):
    path = xl_lora_file(tmp_path)
    base = pipe("a cat", num_inference_steps=2, height=32, width=32,
                rng=jax.random.PRNGKey(3))
    pipe.patch_pipe(path)
    assert pipe.lora_unet is not None
    assert pipe.lora_text is not None
    assert pipe.lora_text2 is not None
    patched = pipe("a cat", num_inference_steps=2, height=32, width=32,
                   rng=jax.random.PRNGKey(3))
    assert np.abs(base - patched).max() > 1e-3

    pipe.tune_lora_scale(0.0)
    zeroed = pipe("a cat", num_inference_steps=2, height=32, width=32,
                  rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(zeroed, base, atol=1e-4)
    pipe.tune_lora_scale(1.0)

    import dataclasses

    frozen = dataclasses.replace(pipe)  # shallow copy for collapse
    frozen.collapse_lora()
    assert frozen.lora_unet is None and frozen.lora_text2 is None
    collapsed = frozen("a cat", num_inference_steps=2, height=32, width=32,
                       rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(collapsed, patched, atol=2e-4)

    pipe.remove_lora()
    removed = pipe("a cat", num_inference_steps=2, height=32, width=32,
                   rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(removed, base, atol=1e-6)


def test_img2img(pipe):
    img = jnp.zeros((1, 32, 32, 3))
    out = pipe.img2img("a cat", img, strength=0.5, num_inference_steps=4)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_save_load_diffusers_layout(pipe, tmp_path):
    from lora_tpu.models.hf_import import save_pipeline_params

    d = str(tmp_path / "xl_pipe")
    save_pipeline_params(pipe, d)
    reloaded = StableDiffusionXLPipeline.from_pretrained(
        d, require_real_tokenizer=False)
    assert reloaded.unet_cfg == pipe.unet_cfg
    assert reloaded.text2_cfg.projection_dim == TINY_XL_TEXT2.projection_dim
    assert reloaded.text2_cfg.hidden_act == "gelu"
    a = pipe("a cat", num_inference_steps=2, height=32, width=32,
             rng=jax.random.PRNGKey(5))
    b = reloaded("a cat", num_inference_steps=2, height=32, width=32,
                 rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_patch_pipe_lycoris_xl(pipe, tmp_path):
    """SDXL LyCORIS: a LoHa unet module (LDM key naming) and a DoRA te2
    module (lora_te2_ prefix) dispatch per-module through patch_pipe and
    land as exact full-rank deltas; closed forms checked per algorithm."""
    import dataclasses

    from lora_tpu.formats.kohya import _xl_index
    from lora_tpu.formats.lycoris import load_lycoris_xl
    from lora_tpu.formats.reader import save_file

    usites = unet_locon_sites(TINY_XL_UNET)
    t2 = text_encoder_locon_sites(TINY_XL_TEXT2)
    uidx = _xl_index("unet", usites, TINY_XL_UNET)
    t2idx = _xl_index("text_encoder_2", t2, TINY_XL_UNET)
    ubase, usite = next((k, s) for k, s in uidx.items()
                        if s.kind == "linear")
    tbase, tsite = next((k, s) for k, s in t2idx.items()
                        if s.kind == "linear")
    rng = np.random.RandomState(41)
    r = 2
    tensors = {
        ubase + ".hada_w1_a": rng.randn(usite.out_dim, r).astype(np.float32),
        ubase + ".hada_w1_b": rng.randn(r, usite.in_dim).astype(np.float32),
        ubase + ".hada_w2_a": rng.randn(usite.out_dim, r).astype(np.float32),
        ubase + ".hada_w2_b": rng.randn(r, usite.in_dim).astype(np.float32),
        tbase + ".lora_up.weight":
            (0.1 * rng.randn(tsite.out_dim, r)).astype(np.float32),
        tbase + ".lora_down.weight":
            rng.randn(r, tsite.in_dim).astype(np.float32),
        tbase + ".dora_scale":
            (rng.rand(tsite.out_dim, 1) + 0.5).astype(np.float32),
    }
    p = str(tmp_path / "lyco_xl.safetensors")
    save_file(tensors, p)

    # base-weight-dependent modules demand params
    with pytest.raises(ValueError, match="base weights"):
        load_lycoris_xl(p, unet_cfg=TINY_XL_UNET, text2_sites=t2)

    pp = dataclasses.replace(pipe)
    pp.patch_pipe(p)
    assert pp.lora_unet is not None and pp.lora_text2 is not None
    assert pp.lora_text is None

    # LoHa closed form (alpha defaults to r -> multiplier 1)
    want_u = ((tensors[ubase + ".hada_w1_a"]
               @ tensors[ubase + ".hada_w1_b"])
              * (tensors[ubase + ".hada_w2_a"]
                 @ tensors[ubase + ".hada_w2_b"]))
    np.testing.assert_allclose(
        np.asarray(pp.lora_unet["sites"][usite.name]["delta"]), want_u,
        rtol=1e-5, atol=1e-5)

    # DoRA closed form against the pipe's te2 base weight
    w = np.asarray(pipe.text2_params[tsite.name + ".weight"], np.float32)
    wp = w + (tensors[tbase + ".lora_up.weight"]
              @ tensors[tbase + ".lora_down.weight"])
    norm = np.linalg.norm(wp, axis=1, keepdims=True) \
        + np.finfo(np.float32).eps
    want_t = tensors[tbase + ".dora_scale"] * wp / norm - w
    np.testing.assert_allclose(
        np.asarray(pp.lora_text2["sites"][tsite.name]["delta"]), want_t,
        rtol=1e-5, atol=1e-6)

    # the adapter acts end to end, and removal restores the base output
    base_img = pipe("a cat", num_inference_steps=2, height=32, width=32,
                    rng=jax.random.PRNGKey(3))
    lyco_img = pp("a cat", num_inference_steps=2, height=32, width=32,
                  rng=jax.random.PRNGKey(3))
    assert float(np.abs(lyco_img - base_img).max()) > 1e-6
    pp.remove_lora()
    off_img = pp("a cat", num_inference_steps=2, height=32, width=32,
                 rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(off_img, base_img)
