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


def test_locon_mid_factor_raises(tmp_path):
    """LoCon CP-decomposition adds '<site>.lora_mid.weight' to otherwise
    known sites; loading up@down while dropping the mid factor would be
    silently wrong weights, so the loader must reject the group loudly
    (names the module) instead of partial-loading."""
    lu, _ = make_loras(17)
    p = str(tmp_path / "k.safetensors")
    save_kohya(p, lora_unet=lu, unet_sites=USITES)
    with SafetensorsFile(p) as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    # attach a CP mid factor to a known attention site (LyCORIS layout)
    site_key = kohya_key("unet", USITES[0].name)
    tensors[site_key + ".lora_mid.weight"] = np.zeros((2, 2, 1, 1),
                                                      np.float16)
    p2 = str(tmp_path / "locon_cp.safetensors")
    save_file(tensors, p2)
    with pytest.raises(ValueError, match="lora_mid") as ei:
        load_kohya(p2, unet_sites=USITES)
    assert USITES[0].name.replace(".", "_") in str(ei.value)


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
