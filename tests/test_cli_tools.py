"""Tool layer: lora_add modes, lora_join/LoRAManager, SVD distillation,
pt->safetensors conversion, CompVis ckpt export."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.cli.lora_add import add
from lora_tpu.core.lora import collapse_lora, init_lora, lora_to_pairs
from lora_tpu.core.svd import svd_distill
from lora_tpu.formats.reader import SafetensorsFile
from lora_tpu.formats.safetensors_io import (
    UNET_DEFAULT_TARGET_REPLACE,
    load_safeloras_both,
    save_safeloras_with_embeds,
)
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import StableDiffusionPipeline


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)


def tiny_lora_file(pipe, path, seed=0, r=2, ti=True):
    usites = pipe.unet_sites()
    ul = init_lora(usites, r=r, rng=jax.random.PRNGKey(seed))
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), len(ul["sites"]))
    for (n, e), k in zip(sorted(ul["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.05
    embeds = {}
    if ti:
        embeds = {f"<s{seed}>": np.random.RandomState(seed).randn(
            TINY_TEXT.hidden_size).astype(np.float32)}
    save_safeloras_with_embeds(
        {"unet": (lora_to_pairs(ul, usites), UNET_DEFAULT_TARGET_REPLACE)},
        embeds, path)
    return ul


def test_lpl_merge_safetensors(pipe, tmp_path, golden_disney):
    out = str(tmp_path / "merged.safetensors")
    add(golden_disney, golden_disney, out, alpha_1=0.25, alpha_2=0.75,
        mode="lpl")
    orig, _ = load_safeloras_both(golden_disney)
    merged, embeds = load_safeloras_both(out)
    # 0.25x + 0.75x == x (fp16 rounding)
    np.testing.assert_allclose(merged["unet"][0][0].astype(np.float32),
                               orig["unet"][0][0].astype(np.float32),
                               rtol=2e-3, atol=1e-4)
    assert set(embeds) == {"<s1>", "<s2>"}  # TI embeds pass through


def test_lpl_merge_pt(tmp_path):
    from lora_tpu.formats import pt_io

    p1, p2 = str(tmp_path / "a.pt"), str(tmp_path / "b.pt")
    pairs1 = [(np.ones((4, 2), np.float32), np.full((2, 4), 2.0, np.float32))]
    pairs2 = [(np.full((4, 2), 3.0, np.float32), np.ones((2, 4), np.float32))]
    pt_io.save_lora_pt(pairs1, p1)
    pt_io.save_lora_pt(pairs2, p2)
    out = str(tmp_path / "m.pt")
    add(p1, p2, out, alpha_1=0.5, alpha_2=0.5, mode="lpl")
    merged = pt_io.load_lora_pt(out)
    np.testing.assert_allclose(merged[0], np.full((4, 2), 2.0), rtol=1e-3)
    np.testing.assert_allclose(merged[1], np.full((2, 4), 1.5), rtol=1e-3)


def test_ljl_join_and_manager(pipe, tmp_path):
    import dataclasses

    p1 = str(tmp_path / "l1.safetensors")
    p2 = str(tmp_path / "l2.safetensors")
    tiny_lora_file(pipe, p1, seed=0)
    tiny_lora_file(pipe, p2, seed=1)
    out = str(tmp_path / "joined.safetensors")
    add(p1, p2, out, mode="ljl")
    with SafetensorsFile(out) as f:
        meta = f.metadata()
        assert meta["unet:0:rank"] == "4"  # 2 + 2
        assert f.shape("unet:0:down")[0] == 4
        assert meta.get("<s0-0>") == "<embed>"
        assert meta.get("<s1-0>") == "<embed>"

    # LoRAManager over the two separate files
    from lora_tpu.data.tokenizer import CLIPTokenizer
    from lora_tpu.lora_manager import LoRAManager

    p = dataclasses.replace(pipe)
    p.tokenizer = CLIPTokenizer(vocab_size=TINY_TEXT.vocab_size)
    mgr = LoRAManager([p1, p2], p)
    assert mgr.ranklist == [2, 2]
    assert mgr.token_size_list == [1, 1]
    assert mgr.prompt("a <1> and <2>") == "a <s0-0> and <s1-0>"
    mgr.tune([0.5, 0.2])
    diag = np.asarray(p.lora_unet["sites"][next(
        iter(p.lora_unet["sites"]))]["diag"])
    np.testing.assert_allclose(diag, [0.5, 0.5, 0.2, 0.2])
    img = p("a <1> photo", num_inference_steps=2, height=64, width=64)
    assert np.isfinite(img).all()


def test_svd_distill_recovers_low_rank(pipe):
    """If tuned = base + up@down (rank r), SVD at rank r recovers the delta
    exactly (clamp off)."""
    usites = pipe.unet_sites()[:4]
    lora = init_lora(usites, r=2, rng=jax.random.PRNGKey(3))
    ks = jax.random.split(jax.random.PRNGKey(4), len(lora["sites"]))
    for (n, e), k in zip(sorted(lora["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.05
    base = {s.name + ".weight": pipe.unet_params[s.name + ".weight"]
            for s in usites}
    tuned = collapse_lora(base, lora, alpha=1.0)
    distilled = svd_distill(base, tuned, usites, rank=2, clamp_quantile=1.0)
    for s in usites:
        delta_true = (np.asarray(tuned[s.name + ".weight"], np.float32)
                      - np.asarray(base[s.name + ".weight"], np.float32))
        e = distilled["sites"][s.name]
        delta_svd = np.asarray(e["up"], np.float32) @ np.asarray(
            e["down"], np.float32)
        np.testing.assert_allclose(delta_svd, delta_true, rtol=2e-2,
                                   atol=2e-4)


def test_svd_distill_locon_roundtrip(pipe, tmp_path):
    """The --locon distillation path end to end: a fine-tune whose residual
    lives on LoCon-only modules (downsampler conv, ff output linear,
    proj_in) distills over the LoCon superset, saves in the kohya schema,
    and — loaded back through patch_pipe — reproduces the tuned forward."""
    from lora_tpu.core.sites import unet_locon_sites
    from lora_tpu.formats.kohya import save_kohya
    from lora_tpu.models.unet import unet_forward

    locon = unet_locon_sites(TINY_UNET)
    picked = [next(s for s in locon if "downsamplers" in s.name),
              next(s for s in locon if s.name.endswith("ff.net.2")),
              next(s for s in locon if s.name.endswith("proj_in"))]
    assert all(s.name not in {t.name for t in pipe.unet_sites()}
               for s in picked), "these must be LoCon-only modules"
    lora = init_lora(picked, r=2, rng=jax.random.PRNGKey(8))
    ks = jax.random.split(jax.random.PRNGKey(9), len(lora["sites"]))
    for (n, e), k in zip(sorted(lora["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.05
    tuned = collapse_lora(pipe.unet_params, lora, alpha=1.0)

    distilled = svd_distill(pipe.unet_params, tuned, locon, rank=2,
                            clamp_quantile=1.0)
    p = str(tmp_path / "locon_distill.safetensors")
    save_kohya(p, lora_unet=distilled, unet_sites=locon)

    fresh = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    fresh.patch_pipe(p, patch_text=False)
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 8, 8, 4))
    t = jnp.asarray([3])
    ctx = jax.random.normal(jax.random.PRNGKey(11),
                            (1, 4, TINY_UNET.cross_attention_dim))
    want = unet_forward(tuned, x, t, ctx, TINY_UNET)
    got = unet_forward(fresh.unet_params, x, t, ctx, TINY_UNET,
                       lora=fresh.lora_unet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)  # fp16 kohya storage


def test_svd_distill_conv_shapes():
    from lora_tpu.core.sites import Site
    from lora_tpu.core.svd import svd_distill_site

    wb = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 3, 3)) * 0.1
    wt = wb + jax.random.normal(jax.random.PRNGKey(1), (8, 4, 3, 3)) * 0.01
    up, down = svd_distill_site(wb, wt, rank=2)
    assert up.shape == (8, 2, 1, 1) and down.shape == (2, 4, 3, 3)


def test_pt_to_safetensors_reference_filenames(pipe, tmp_path):
    """Converting the reference DreamBooth output pair must map
    lora_weight.pt -> unet and lora_weight.text_encoder.pt -> text_encoder
    (reference cli_pt_to_safetensors.py:57-66), and the result must be
    loadable by patch_pipe."""
    import torch

    from lora_tpu.cli.pt_to_safetensors import convert, model_name_for
    from lora_tpu.formats.pt_io import save_lora_pt
    from lora_tpu.formats.safetensors_io import load_safeloras_both

    assert model_name_for("/x/lora_weight.pt") == "unet"
    assert model_name_for("lora_weight.text_encoder.pt") == "text_encoder"
    assert model_name_for("a/b.custom.pt") == "custom"

    unet_pairs = lora_to_pairs(
        init_lora(pipe.unet_sites(), r=2, rng=jax.random.PRNGKey(0)),
        pipe.unet_sites())
    text_pairs = lora_to_pairs(
        init_lora(pipe.text_sites(), r=2, rng=jax.random.PRNGKey(1)),
        pipe.text_sites())
    lora_path = str(tmp_path / "lora_weight.pt")
    text_path = str(tmp_path / "lora_weight.text_encoder.pt")
    ti_path = str(tmp_path / "lora_weight.ti.pt")
    save_lora_pt(unet_pairs, lora_path)
    save_lora_pt(text_pairs, text_path)
    torch.save({"<tok>": torch.zeros(TINY_TEXT.hidden_size)}, ti_path)

    out = str(tmp_path / "conv.safetensors")
    convert(lora_path, text_path, ti_path, outpath=out)
    loras, embeds = load_safeloras_both(out)
    assert set(loras) == {"unet", "text_encoder"}
    assert loras["unet"][1] == [2] * len(unet_pairs)
    assert loras["text_encoder"][1] == [2] * len(text_pairs)
    assert "<tok>" in embeds

    # round-trip through patch_pipe: model keys are the ones it looks for
    tokens = pipe.patch_pipe(out)
    assert pipe.lora_unet is not None and pipe.lora_text is not None
    assert "<tok>" in tokens
    pipe.remove_lora()

    # refuses to overwrite without the flag, and to collide model names
    with pytest.raises(ValueError, match="already exists"):
        convert(lora_path, outpath=out)
    dup = str(tmp_path / "sub")
    os.makedirs(dup, exist_ok=True)
    dup_path = os.path.join(dup, "lora_weight.pt")
    save_lora_pt(unet_pairs, dup_path)
    with pytest.raises(ValueError, match="map to model name"):
        convert(lora_path, dup_path, outpath=str(tmp_path / "dup.safetensors"))

    # rank override is a cross-check: correct value passes, wrong one errors
    convert(lora_path, outpath=out, overwrite=True,
            **{"unet.rank": unet_pairs[0][1].shape[0]})
    with pytest.raises(ValueError, match="does not match"):
        convert(lora_path, outpath=out, overwrite=True, **{"unet.rank": 99})

    # argv parsing: bare --overwrite must behave as a boolean flag in any
    # position (regression: it swallowed the next argument / IndexError'd)
    import sys as _sys
    from unittest import mock

    from lora_tpu.cli import pt_to_safetensors as mod

    for argv in (["prog", lora_path, "--outpath", out, "--overwrite"],
                 ["prog", "--overwrite", lora_path, "--outpath", out]):
        with mock.patch.object(_sys, "argv", argv):
            mod.main()  # succeeds over the existing file


def test_ckpt_export_keys(pipe, tmp_path):
    import torch

    from lora_tpu.formats.ckpt_export import convert_to_ckpt

    out = str(tmp_path / "export.ckpt")
    convert_to_ckpt(pipe, out, as_half=True)
    sd = torch.load(out, map_location="cpu", weights_only=False)["state_dict"]
    # UNet CompVis layout
    assert "model.diffusion_model.input_blocks.0.0.weight" in sd
    assert "model.diffusion_model.time_embed.0.weight" in sd
    assert "model.diffusion_model.out.2.bias" in sd
    assert ("model.diffusion_model.input_blocks.1.0.in_layers.2.weight"
            in sd)
    assert ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0."
            "attn1.to_q.weight" in sd)
    assert "model.diffusion_model.middle_block.1.proj_in.weight" in sd
    # VAE: attention projections exported as 1x1 convs, reversed up indices
    q = sd["first_stage_model.encoder.mid.attn_1.q.weight"]
    assert q.ndim == 4 and q.shape[2:] == (1, 1)
    assert "first_stage_model.decoder.up.3.block.0.conv1.weight" in sd
    assert "first_stage_model.encoder.down.0.downsample.conv.weight" in sd
    # text encoder passthrough
    assert ("cond_stage_model.transformer.text_model.encoder.layers.0."
            "self_attn.k_proj.weight" in sd)
    assert sd["model.diffusion_model.out.2.bias"].dtype == torch.float16
    # no unet key left unmapped
    assert not any(k.startswith("model.diffusion_model.down_blocks")
                   for k in sd)


def test_upl_collapse_roundtrip(pipe, tmp_path):
    """upl: base + LoRA collapsed -> diffusers dir; reload must match the
    runtime-LoRA pipeline output."""
    import dataclasses

    from lora_tpu.models.hf_import import save_pipeline_params

    base_dir = str(tmp_path / "base")
    save_pipeline_params(pipe, base_dir)
    lora_path = str(tmp_path / "l.safetensors")
    tiny_lora_file(pipe, lora_path, seed=7, ti=False)

    out_dir = str(tmp_path / "merged")
    add(base_dir, lora_path, out_dir, alpha_1=1.0, mode="upl")

    merged = StableDiffusionPipeline.from_pretrained(
        out_dir, tokenizer=pipe.tokenizer)
    runtime = dataclasses.replace(pipe)
    runtime.patch_pipe(lora_path, patch_ti=False)
    lat = pipe.prepare_latents(1, 64, 64, jax.random.PRNGKey(5))
    a = runtime("q", num_inference_steps=2, height=64, width=64, latents=lat)
    b = merged("q", num_inference_steps=2, height=64, width=64, latents=lat)
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=6e-3)


def test_svd_distill_cli_rejects_conflicting_target_flags(tmp_path):
    """--extended and --locon together must error (locon would silently win
    otherwise), and must do so before any model loading."""
    import pytest

    from lora_tpu.cli.lora_distill import svd_distill_cli

    with pytest.raises(ValueError, match="conflicting target flags"):
        svd_distill_cli(target_model=str(tmp_path / "nonexistent_tuned"),
                        base_model=str(tmp_path / "nonexistent_base"),
                        extended=True, locon=True)


def test_svd_distill_from_lora_converts_dora_to_plain_pairs(pipe, tmp_path):
    """--from_lora: a DoRA kohya file (base-weight-dependent, full-rank
    delta) converts to a plain reference-schema (up, down) LoRA in one
    command. At full rank with clamp off the conversion is exact, so the
    distilled file's patched forward must match the DoRA original's."""
    import dataclasses

    from lora_tpu.cli.lora_distill import svd_distill_cli
    from lora_tpu.formats.kohya import kohya_key
    from lora_tpu.formats.reader import save_file
    from lora_tpu.models.hf_import import save_pipeline_params
    from lora_tpu.models.unet import unet_forward

    base_dir = str(tmp_path / "base")
    save_pipeline_params(pipe, base_dir)
    usites = pipe.unet_sites()
    lin = usites[0]
    rng = np.random.RandomState(31)
    key = kohya_key("unet", lin.name)
    up = (0.1 * rng.randn(lin.out_dim, 2)).astype(np.float32)
    down = rng.randn(2, lin.in_dim).astype(np.float32)
    m = (rng.rand(lin.out_dim, 1) + 0.5).astype(np.float32)
    src = str(tmp_path / "dora.safetensors")
    save_file({key + ".lora_up.weight": up,
               key + ".lora_down.weight": down,
               key + ".alpha": np.float32(2.0),
               key + ".dora_scale": m}, src)

    out = str(tmp_path / "plain.safetensors")
    svd_distill_cli(target_model=src, base_model=base_dir,
                    rank=min(lin.out_dim, lin.in_dim), clamp_quantile=1.0,
                    save_path=out, from_lora=True)

    orig = dataclasses.replace(pipe)
    orig.patch_pipe(src)
    conv = dataclasses.replace(pipe)
    conv.patch_pipe(out, patch_ti=False)
    assert "delta" in orig.lora_unet["sites"][lin.name]
    assert "up" in conv.lora_unet["sites"][lin.name]

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    t = jnp.asarray([7])
    ctx = jax.random.normal(jax.random.PRNGKey(6),
                            (1, 4, TINY_UNET.cross_attention_dim))
    a = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET,
                     lora=orig.lora_unet)
    b = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET,
                     lora=conv.lora_unet)
    base = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET, lora=None)
    assert float(jnp.abs(a - base).max()) > 1e-4  # the adapter does act
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                               atol=1e-4)


def test_svd_distill_from_lora_rejects_reference_schema(pipe, tmp_path):
    from lora_tpu.cli.lora_distill import svd_distill_cli
    from lora_tpu.models.hf_import import save_pipeline_params

    base_dir = str(tmp_path / "base")
    save_pipeline_params(pipe, base_dir)
    ref_file = str(tmp_path / "ref.safetensors")
    tiny_lora_file(pipe, ref_file, seed=9, ti=False)
    with pytest.raises(ValueError, match="already plain"):
        svd_distill_cli(target_model=ref_file, base_model=base_dir,
                        save_path=str(tmp_path / "o.safetensors"),
                        from_lora=True)


def test_svd_distill_from_lora_xl(tmp_path):
    """SDXL --from_lora: a LyCORIS-XL LoHa file (full-rank delta on the
    te1 encoder + plain pair on the unet) converts to a plain kohya-XL
    LoRA against an XL base dir; at covering rank the patched forwards
    match."""
    import dataclasses

    from lora_tpu.cli.lora_distill import svd_distill_cli
    from lora_tpu.core.sites import text_encoder_lora_sites
    from lora_tpu.formats.kohya import _xl_index
    from lora_tpu.formats.reader import save_file
    from lora_tpu.models.config import (
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.models.hf_import import save_pipeline_params
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    base_dir = str(tmp_path / "xlbase")
    save_pipeline_params(pipe, base_dir)

    rng = np.random.RandomState(41)
    usites = pipe.unet_sites()
    t1sites = text_encoder_lora_sites(TINY_XL_TEXT)
    ukey = next(iter(_xl_index("unet", usites[:1], TINY_XL_UNET)))
    tkey = next(iter(_xl_index("text_encoder", t1sites[:1], TINY_XL_UNET)))
    ulin, tlin = usites[0], t1sites[0]
    r = 2
    tensors = {
        ukey + ".lora_up.weight":
            (0.1 * rng.randn(ulin.out_dim, r)).astype(np.float32),
        ukey + ".lora_down.weight":
            rng.randn(r, ulin.in_dim).astype(np.float32),
        ukey + ".alpha": np.float32(r),
        tkey + ".hada_w1_a":
            (0.2 * rng.randn(tlin.out_dim, r)).astype(np.float32),
        tkey + ".hada_w1_b": rng.randn(r, tlin.in_dim).astype(np.float32),
        tkey + ".hada_w2_a":
            (0.2 * rng.randn(tlin.out_dim, r)).astype(np.float32),
        tkey + ".hada_w2_b": rng.randn(r, tlin.in_dim).astype(np.float32),
    }
    src = str(tmp_path / "xl_lyco.safetensors")
    save_file(tensors, src)

    out = str(tmp_path / "xl_plain.safetensors")
    svd_distill_cli(target_model=src, base_model=base_dir,
                    rank=min(tlin.out_dim, tlin.in_dim), clamp_quantile=1.0,
                    save_path=out, from_lora=True)

    orig = dataclasses.replace(pipe)
    orig.patch_pipe(src)
    conv = dataclasses.replace(pipe)
    conv.patch_pipe(out)
    assert "delta" in orig.lora_text["sites"][tlin.name]
    assert "up" in conv.lora_text["sites"][tlin.name]
    a = orig.encode_prompt_xl(["a cat"])
    b = conv.encode_prompt_xl(["a cat"])
    base = pipe.encode_prompt_xl(["a cat"])
    assert float(jnp.abs(a[0] - base[0]).max()) > 1e-4
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]),
                               rtol=1e-3, atol=1e-4)

    # schema mismatch: SD1.x adapter against the XL base raises
    sd_file = str(tmp_path / "sd.safetensors")
    save_file({"lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
               "_attn1_to_q.lora_up.weight": np.zeros((4, 2), np.float32),
               "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
               "_attn1_to_q.lora_down.weight":
               np.zeros((2, 4), np.float32)}, sd_file)
    with pytest.raises(ValueError, match="does not match the base model"):
        svd_distill_cli(target_model=sd_file, base_model=base_dir,
                        save_path=str(tmp_path / "x.safetensors"),
                        from_lora=True)
