"""kohya-ss / webui LoRA format interop (formats/kohya.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import init_lora, lora_delta_dense, tune_lora_scale
from lora_tpu.core.sites import text_encoder_lora_sites, unet_lora_sites
from lora_tpu.formats.kohya import kohya_key, load_kohya, save_kohya
from lora_tpu.formats.reader import SafetensorsFile, save_file
from lora_tpu.models.config import TINY_TEXT, TINY_UNET

USITES = unet_lora_sites(TINY_UNET)
TSITES = text_encoder_lora_sites(TINY_TEXT)


def make_loras(seed=0):
    lu = init_lora(USITES, r=2, rng=jax.random.PRNGKey(seed))
    lt = init_lora(TSITES, r=2, rng=jax.random.PRNGKey(seed + 1))
    for lora in (lu, lt):  # non-zero ups so deltas are meaningful
        for i, e in enumerate(sorted(lora["sites"])):
            lora["sites"][e]["up"] = jax.random.normal(
                jax.random.PRNGKey(100 + i), lora["sites"][e]["up"].shape)
    return lu, lt


def test_key_schema(tmp_path):
    """Exact community key strings, cross-read by the official package."""
    lu, lt = make_loras()
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES,
               lora_text=lt, text_sites=TSITES)
    import safetensors.numpy as st

    tensors = st.load_file(p)
    assert ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_"
            "attn1_to_q.lora_down.weight") in tensors
    assert ("lora_te_text_model_encoder_layers_0_self_attn_q_proj"
            ".alpha") in tensors
    a = tensors["lora_unet_mid_block_attentions_0_transformer_blocks_0_"
                "attn1_to_q.alpha"]
    assert float(a) == 2.0  # alpha == rank -> webui multiplier 1.0


def test_round_trip_with_scale_fold(tmp_path):
    """Save at runtime scale 0.5; the loaded tree at scale 1.0 must produce
    the same deltas (scale folded into up, realize_as_lora semantics)."""
    lu, lt = make_loras(3)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=tune_lora_scale(lu, 0.5), unet_sites=USITES,
               lora_text=lt, text_sites=TSITES)
    lu2, lt2 = load_kohya(p, unet_sites=USITES, text_sites=TSITES)
    assert set(lu2["sites"]) == set(lu["sites"])
    name = USITES[0].name
    x = jax.random.normal(jax.random.PRNGKey(9), (3, USITES[0].in_dim))
    want = lora_delta_dense(x, lu["sites"][name], jnp.float32(0.5))
    got = lora_delta_dense(x, lu2["sites"][name], lu2["scale"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)  # fp16 storage


def test_alpha_rescaling_and_partial_coverage(tmp_path):
    """alpha != rank folds alpha/rank into up (webui multiplier); files
    covering a module subset load as a partial site dict."""
    lu, _ = make_loras(5)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES)
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    # keep only attn1.to_q sites; halve their alpha
    keep = {k: v for k, v in tensors.items() if "attn1_to_q" in k}
    for k in list(keep):
        if k.endswith(".alpha"):
            keep[k] = np.asarray(float(keep[k]) / 2, np.float16)
    p2 = str(tmp_path / "partial.safetensors")
    save_file(keep, p2)
    lu2, lt2 = load_kohya(p2, unet_sites=USITES, text_sites=TSITES)
    assert lt2 is None
    assert 0 < len(lu2["sites"]) < len(USITES)
    name = next(iter(lu2["sites"]))
    np.testing.assert_allclose(
        np.asarray(lu2["sites"][name]["up"]),
        np.asarray(lu["sites"][name]["up"], np.float32).astype(np.float16)
        .astype(np.float32) * 0.5, rtol=1e-3, atol=1e-4)


def test_unknown_modules_raise(tmp_path):
    lu, _ = make_loras(7)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES)
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    tensors["lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight"] = \
        np.zeros((2, 4, 3, 3), np.float16)
    tensors["lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight"] = \
        np.zeros((4, 2, 1, 1), np.float16)
    p2 = str(tmp_path / "locon.safetensors")
    save_file(tensors, p2)
    with pytest.raises(ValueError, match="outside the known site set"):
        load_kohya(p2, unet_sites=USITES)


def test_locon_mid_factor_on_linear_raises(tmp_path):
    """A CP mid factor only makes sense on a conv site; one attached to a
    linear module must be rejected loudly (names the module) instead of
    partial-loading up@down without it."""
    lu, _ = make_loras(17)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES)
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    # attach a CP mid factor to a known attention (linear) site
    site_key = kohya_key("unet", USITES[0].name)
    tensors[site_key + ".lora_mid.weight"] = np.zeros((2, 2, 1, 1),
                                                      np.float16)
    p2 = str(tmp_path / "locon_cp.safetensors")
    save_file(tensors, p2)
    with pytest.raises(ValueError, match="lora_mid") as ei:
        load_kohya(p2, unet_sites=USITES)
    assert USITES[0].name.replace(".", "_") in str(ei.value)


def test_loha_factors_raise(tmp_path):
    """load_kohya is the pairs-preserving loader: LoHa factors must be
    rejected here (patch_pipe routes them to formats/lycoris.py instead) —
    it never partial-loads a decomposition it doesn't keep factored."""
    lu, _ = make_loras(19)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES)
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    site_key = kohya_key("unet", USITES[0].name)
    tensors[site_key + ".hada_w1_a"] = np.zeros((2, 4), np.float16)
    p2 = str(tmp_path / "loha.safetensors")
    save_file(tensors, p2)
    with pytest.raises(ValueError, match="unrecognized kohya key"):
        load_kohya(p2, unet_sites=USITES)


def _conv_nhwc(x, w, stride=(1, 1), padding=(0, 0)):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


def test_locon_cp_conv_composes_exactly(tmp_path):
    """A CP-decomposed conv (up 1x1 . mid kxk . down 1x1, the LyCORIS
    LoCon layout) loads by folding mid.down into one kxk down conv; the
    loaded delta must equal the explicit three-conv chain to rounding."""
    from lora_tpu.core.lora import lora_delta_conv
    from lora_tpu.core.sites import unet_locon_sites

    sites = unet_locon_sites(TINY_UNET)
    site = next(s for s in sites if s.name.endswith("resnets.0.conv1"))
    r, rng = 3, np.random.RandomState(0)
    down = rng.randn(r, site.in_dim, 1, 1).astype(np.float32)
    mid = rng.randn(r, r, *site.kernel).astype(np.float32)
    up = rng.randn(site.out_dim, r, 1, 1).astype(np.float32)
    key = kohya_key("unet", site.name)
    save_file({key + ".lora_down.weight": down.astype(np.float16),
               key + ".lora_mid.weight": mid.astype(np.float16),
               key + ".lora_up.weight": up.astype(np.float16),
               key + ".alpha": np.asarray(float(r), np.float16)},
              str(tmp_path / "cp.safetensors"))
    lu, _ = load_kohya(str(tmp_path / "cp.safetensors"), unet_sites=sites)
    assert set(lu["sites"]) == {site.name}

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, site.in_dim))
    got = lora_delta_conv(x, lu["sites"][site.name], lu["scale"],
                          site.stride, site.padding)
    h = _conv_nhwc(x, down.astype(np.float16).astype(np.float32))
    h = _conv_nhwc(h, mid.astype(np.float16).astype(np.float32),
                   site.stride, site.padding)
    want = _conv_nhwc(h, up.astype(np.float16).astype(np.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_locon_full_file_patches_and_applies(tmp_path):
    """A full-conv LoCon file — modules beyond the reference's target sets
    (proj_in/proj_out, ff.net.2, down/upsampler convs) plus a CP conv —
    autoloads through patch_pipe and changes the UNet forward."""
    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import (
        text_encoder_locon_sites,
        unet_locon_sites,
    )
    from lora_tpu.models.unet import unet_forward
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    usites = unet_locon_sites(TINY_UNET)
    tsites = text_encoder_locon_sites(TINY_TEXT)
    extras = [s for s in usites
              if ("proj_in" in s.name or "proj_out" in s.name
                  or "ff.net.2" in s.name or "samplers" in s.name)]
    assert extras, "locon superset lost its extra modules"
    lu = init_lora(extras, r=2, rng=jax.random.PRNGKey(21))
    lt = init_lora(tsites[:6], r=2, rng=jax.random.PRNGKey(22))
    for lora in (lu, lt):
        for i, e in enumerate(sorted(lora["sites"])):
            lora["sites"][e]["up"] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(300 + i), lora["sites"][e]["up"].shape)
    p = str(tmp_path / "locon.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=extras,
               lora_text=lt, text_sites=tsites[:6])
    # add one CP-decomposed resnet conv on top
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    site = next(s for s in usites if s.name.endswith("resnets.0.conv1"))
    rng = np.random.RandomState(1)
    key = kohya_key("unet", site.name)
    tensors[key + ".lora_down.weight"] = \
        rng.randn(2, site.in_dim, 1, 1).astype(np.float16)
    tensors[key + ".lora_mid.weight"] = \
        (0.1 * rng.randn(2, 2, *site.kernel)).astype(np.float16)
    tensors[key + ".lora_up.weight"] = \
        (0.1 * rng.randn(site.out_dim, 2, 1, 1)).astype(np.float16)
    save_file(tensors, p)

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    pipe.patch_pipe(p)
    loaded = set(pipe.lora_unet["sites"])
    assert {s.name for s in extras} | {site.name} == loaded
    assert len(pipe.lora_text["sites"]) == 6

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    t = jnp.asarray([7])
    ctx = jax.random.normal(jax.random.PRNGKey(6),
                            (1, 4, TINY_UNET.cross_attention_dim))
    base = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET, lora=None)
    patched = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET,
                           lora=pipe.lora_unet)
    assert float(jnp.abs(patched - base).max()) > 1e-6


def test_patch_pipe_autodetects_kohya(tmp_path):
    """pipe.patch_pipe on a kohya-schema file routes through the kohya
    loader and produces the same deltas as the native format."""
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    lu, lt = make_loras(11)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES,
               lora_text=lt, text_sites=TSITES)
    pipe.patch_pipe(p)
    assert pipe.lora_unet is not None and pipe.lora_text is not None
    name = USITES[0].name
    x = jax.random.normal(jax.random.PRNGKey(2), (2, USITES[0].in_dim))
    np.testing.assert_allclose(
        np.asarray(lora_delta_dense(x, pipe.lora_unet["sites"][name],
                                    pipe.lora_unet["scale"])),
        np.asarray(lora_delta_dense(x, lu["sites"][name], lu["scale"])),
        rtol=2e-3, atol=2e-3)


def test_cli_round_trip_both_directions(tmp_path):
    """cloneofsimo -> kohya -> cloneofsimo through the converter CLI
    preserves every tensor (fp16 quantization is the save dtype anyway)."""
    from lora_tpu.cli.kohya_convert import convert
    from lora_tpu.core.lora import lora_to_pairs
    from lora_tpu.formats.safetensors_io import (
        TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
        UNET_DEFAULT_TARGET_REPLACE,
        load_safeloras_both,
        save_safeloras_with_embeds,
    )

    lu, lt = make_loras(13)
    native = str(tmp_path / "native.safetensors")
    save_safeloras_with_embeds(
        {"unet": (lora_to_pairs(lu, USITES), UNET_DEFAULT_TARGET_REPLACE),
         "text_encoder": (lora_to_pairs(lt, TSITES),
                          TEXT_ENCODER_DEFAULT_TARGET_REPLACE)},
        {}, native)
    kohya = str(tmp_path / "kohya.safetensors")
    convert(native, kohya, unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    back = str(tmp_path / "back.safetensors")
    convert(kohya, back, unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    a, _ = load_safeloras_both(native)
    b, _ = load_safeloras_both(back)
    assert set(a) == set(b) == {"unet", "text_encoder"}
    for model in a:
        wa, ra, ta = a[model]
        wb, rb, tb = b[model]
        assert ra == rb and set(ta) == set(tb)
        for x, y in zip(wa, wb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-4)


def test_foreign_prefix_raises(tmp_path):
    """Keys under neither lora_unet_ nor lora_te_ (e.g. SDXL's lora_te1_)
    must be rejected, not silently skipped by both model passes."""
    lu, _ = make_loras(23)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES)
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    tensors["lora_te1_text_model_encoder_layers_0_mlp_fc1.lora_down.weight"] = \
        np.zeros((2, 8), np.float16)
    tensors["lora_te1_text_model_encoder_layers_0_mlp_fc1.lora_up.weight"] = \
        np.zeros((8, 2), np.float16)
    p2 = str(tmp_path / "sdxl.safetensors")
    save_file(tensors, p2)
    with pytest.raises(ValueError, match="unknown prefixes"):
        load_kohya(p2, unet_sites=USITES, text_sites=TSITES)
