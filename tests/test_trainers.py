"""End-to-end trainer smoke tests on tiny configs: DreamBooth and the
two-phase PTI driver, checking artifacts and format compatibility."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from lora_tpu.formats.safetensors_io import load_safeloras_both
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import StableDiffusionPipeline
from lora_tpu.training.dreambooth import DreamBoothConfig, train_dreambooth
from lora_tpu.training.pti import PTIConfig, train_pti


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    for i in range(2):
        arr = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"photo of a sks dog {i}.jpg")
    return str(d)


def test_dreambooth_end_to_end(pipe, image_dir, tmp_path):
    import dataclasses

    out = str(tmp_path / "db_out")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir,
        output_dir=out,
        instance_prompt="a photo of sks dog",
        resolution=64,
        lora_rank=2,
        max_train_steps=3,
        save_steps=2,
        train_text_encoder=True,
        output_format="both",
        seed=0,
    )
    res = train_dreambooth(dataclasses.replace(pipe), cfg)
    assert res["steps"] == 3
    assert np.isfinite(res["final_loss"])
    assert os.path.exists(os.path.join(out, "lora_weight.safetensors"))
    assert os.path.exists(os.path.join(out, "lora_weight.pt"))
    assert os.path.exists(os.path.join(out, "lora_weight_s2.safetensors"))

    # the artifact loads through the reference-format parser and patches
    loras, embeds = load_safeloras_both(
        os.path.join(out, "lora_weight.safetensors"))
    assert set(loras) == {"unet", "text_encoder"}
    assert loras["unet"][1] == [2] * 144
    p2 = dataclasses.replace(pipe)
    p2.patch_pipe(os.path.join(out, "lora_weight.safetensors"))
    assert p2.lora_unet is not None and p2.lora_text is not None


def test_dreambooth_cached_latents(pipe, image_dir, tmp_path):
    import dataclasses

    out = str(tmp_path / "db_cached")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir, output_dir=out,
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=2, save_steps=0, cached_latents=True, seed=0,
        use_8bit_adam=True)  # int8 Adam moments through the real trainer
    res = train_dreambooth(dataclasses.replace(pipe), cfg)
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])
    assert os.path.exists(os.path.join(out, "lora_weight.safetensors"))


def test_dreambooth_locon_targets(pipe, image_dir, tmp_path):
    """lora_targets='locon' trains the full-conv kohya superset and saves a
    kohya-schema artifact that patch_pipe reloads; LoCon-only modules (up
    zero-init) must have received gradient."""
    import dataclasses

    out = str(tmp_path / "db_locon")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir, output_dir=out,
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=2, save_steps=0, train_text_encoder=True,
        lora_targets="locon", output_format="safe", learning_rate=1e-2,
        seed=0)
    res = train_dreambooth(dataclasses.replace(pipe), cfg)
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])
    path = os.path.join(out, "lora_weight.safetensors")
    from lora_tpu.formats.reader import SafetensorsFile

    with SafetensorsFile(path) as f:
        keys = list(f.keys())
    assert any("downsamplers_0_conv.lora_up" in k for k in keys)
    assert any("ff_net_2.lora_up" in k for k in keys)
    assert any("mlp_fc1.lora_up" in k for k in keys)

    p2 = dataclasses.replace(pipe)
    p2.patch_pipe(path)
    down_site = next(n for n in p2.lora_unet["sites"]
                     if "downsamplers" in n)
    assert float(np.abs(np.asarray(
        p2.lora_unet["sites"][down_site]["up"])).max()) > 0, \
        "locon-only conv site never received gradient"

    # pt output cannot carry locon sites -> loud config error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="kohya schema"):
        train_dreambooth(dataclasses.replace(pipe), dataclasses.replace(
            cfg, output_format="both"))


def test_dreambooth_extended_targets_metadata(pipe, image_dir, tmp_path):
    """lora_targets='extended' trains resnet conv sites and the saved file
    declares the extended target set so reload injects the same sites."""
    import dataclasses

    out = str(tmp_path / "db_ext")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir, output_dir=out,
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=1, save_steps=0, lora_targets="extended",
        output_format="safe", seed=0)
    res = train_dreambooth(dataclasses.replace(pipe), cfg)
    assert res["steps"] == 1
    loras, _ = load_safeloras_both(
        os.path.join(out, "lora_weight.safetensors"))
    assert "ResnetBlock2D" in loras["unet"][2]
    p2 = dataclasses.replace(pipe)
    p2.patch_pipe(os.path.join(out, "lora_weight.safetensors"))
    assert any(n.endswith(".conv1") for n in p2.lora_unet["sites"])


def test_pti_end_to_end(pipe, image_dir, tmp_path):
    import dataclasses

    out = str(tmp_path / "pti_out")
    cfg = PTIConfig(
        instance_data_dir=image_dir,
        output_dir=out,
        placeholder_tokens="<s1>|<s2>",
        use_template="object",
        placeholder_token_at_data=None,
        resolution=64,
        lora_rank=2,
        max_train_steps_ti=2,
        max_train_steps_tuning=2,
        save_steps=2,
        gradient_accumulation_steps=1,
        cached_latents=True,
        train_text_encoder=True,
        seed=1,
    )
    p = dataclasses.replace(pipe)
    p.tokenizer = type(pipe.tokenizer)(vocab_size=TINY_TEXT.vocab_size)
    res = train_pti(p, cfg)
    assert np.isfinite(res["final_loss"])
    assert res["placeholder_tokens"] == ["<s1>", "<s2>"]
    assert os.path.exists(os.path.join(out, "step_inv_2.safetensors"))
    final = os.path.join(out, "final_lora.safetensors")
    assert os.path.exists(final)
    loras, embeds = load_safeloras_both(final)
    assert set(embeds) == {"<s1>", "<s2>"}
    assert set(loras) == {"unet", "text_encoder"}
    # inversion artifact is TI-only (save_lora=False)
    inv_loras, inv_embeds = load_safeloras_both(
        os.path.join(out, "step_inv_2.safetensors"))
    assert inv_loras == {} and set(inv_embeds) == {"<s1>", "<s2>"}


def test_pti_extended_continue_inversion_masked(pipe, image_dir, tmp_path):
    """Flag-combo path: extended LoRA targets (resnet convs), continued
    inversion in phase 2, face-segmentation mask conditioning (fallback
    masks), dropout + scale — the use_face_conditioning_example.sh shape."""
    import dataclasses

    out = str(tmp_path / "pti_ext")
    cfg = PTIConfig(
        instance_data_dir=image_dir,
        output_dir=out,
        placeholder_tokens="<s1>",
        use_template="object",
        resolution=64,
        lora_rank=2,
        max_train_steps_ti=1,
        max_train_steps_tuning=2,
        save_steps=0,
        gradient_accumulation_steps=1,
        cached_latents=True,
        train_text_encoder=True,
        use_extended_lora=True,
        continue_inversion=True,
        continue_inversion_lr=1e-4,
        use_face_segmentation_condition=True,
        lora_dropout_p=0.1,
        lora_scale=2.0,
        seed=3,
    )
    p = dataclasses.replace(pipe)
    from lora_tpu.data.tokenizer import CLIPTokenizer

    p.tokenizer = CLIPTokenizer(vocab_size=TINY_TEXT.vocab_size)
    res = train_pti(p, cfg)
    assert np.isfinite(res["final_loss"])
    final = os.path.join(out, "final_lora.safetensors")
    loras, embeds = load_safeloras_both(final)
    assert "<s1>" in embeds
    # extended targets: conv sites present (4-D tensors) and metadata says so
    w, ranks, target = loras["unet"]
    assert "ResnetBlock2D" in target
    assert any(np.asarray(t).ndim == 4 for t in w)
    # runtime scale was folded into saved ups (realize_as_lora semantics)
    # and the artifact patches back into a pipe with extended sites
    p2 = dataclasses.replace(pipe)
    p2.patch_pipe(final)
    assert p2.lora_unet is not None


def test_pti_inpainting_cached_latents(pipe, image_dir, tmp_path):
    """Inpainting PTI with cached latents: masked-image latents and the
    latent-res hole mask are pre-encoded, so the hot loop runs no VAE
    (beyond-reference — cli_lora_pti.py:856 asserts this combination out)."""
    import dataclasses

    out = str(tmp_path / "pti_inpaint")
    cfg = PTIConfig(
        instance_data_dir=image_dir,
        output_dir=out,
        placeholder_tokens="<s1>",
        use_template="object",
        resolution=64,
        lora_rank=2,
        max_train_steps_ti=1,
        max_train_steps_tuning=2,
        save_steps=0,
        gradient_accumulation_steps=1,
        cached_latents=True,
        train_inpainting=True,
        train_text_encoder=False,
        seed=5,
    )
    p = dataclasses.replace(pipe)
    # the inpainting UNet consumes latents+mask+masked latents (4+1+4)
    import lora_tpu.models.config as mcfg

    inpaint_cfg = dataclasses.replace(TINY_UNET, in_channels=9)
    p.unet_cfg = inpaint_cfg
    from lora_tpu.models.unet import init_unet

    p.unet_params = init_unet(inpaint_cfg, jax.random.PRNGKey(9))
    p.tokenizer = type(pipe.tokenizer)(vocab_size=TINY_TEXT.vocab_size)
    res = train_pti(p, cfg)
    assert np.isfinite(res["final_loss"])
    assert os.path.exists(os.path.join(out, "final_lora.safetensors"))


def test_pti_token_validation(pipe):
    cfg = PTIConfig(placeholder_tokens="<s2>|<s1>")  # unsorted
    with pytest.raises(AssertionError):
        from lora_tpu.training.pti import parse_token_args

        parse_token_args(cfg)


def test_dreambooth_preemption_checkpoint(pipe, image_dir, tmp_path):
    """SIGTERM mid-run: the trainer checkpoints the full train state and
    returns cleanly with preempted=True (graceful-preemption handling —
    absent in the reference, SURVEY §5)."""
    import dataclasses
    import signal
    import threading

    out = str(tmp_path / "db_preempt")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir, output_dir=out,
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=500, save_steps=0, cached_latents=True, seed=0)
    # deliver SIGTERM shortly after the run starts (Python routes it to the
    # main thread, where the trainer polls the guard each step)
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        res = train_dreambooth(dataclasses.replace(pipe), cfg)
    finally:
        timer.cancel()
    assert res["preempted"] is True
    assert res["steps"] < 500
    assert os.path.exists(os.path.join(out, "train_state.safetensors"))
    # a preempted run must not write the completed-run artifact name
    assert not os.path.exists(os.path.join(out, "lora_weight.safetensors"))
    # resume picks up exactly where the preempted run stopped
    cfg2 = dataclasses.replace(
        cfg, max_train_steps=res["steps"] + 2,
        resume_state=os.path.join(out, "train_state.safetensors"))
    res2 = train_dreambooth(dataclasses.replace(pipe), cfg2)
    assert res2["preempted"] is False and res2["steps"] == res["steps"] + 2


@pytest.mark.slow
def test_dreambooth_preemption_before_first_step(pipe, image_dir, tmp_path,
                                                 monkeypatch):
    """SIGTERM that lands before any step runs (e.g. during the multi-minute
    first compile) must still return cleanly: steps=0, state checkpoint
    written, no crash on the never-assigned loss, and no final lora_weight
    artifact."""
    import dataclasses

    from lora_tpu.training import checkpoint as ckpt

    class _Preempted(ckpt.PreemptionGuard):
        def __enter__(self):
            super().__enter__()
            self.should_stop = True  # as if the signal already arrived
            return self

    monkeypatch.setattr(ckpt, "PreemptionGuard", _Preempted)
    out = str(tmp_path / "db_preempt0")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir, output_dir=out,
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=50, save_steps=0, cached_latents=True, seed=0)
    res = train_dreambooth(dataclasses.replace(pipe), cfg)
    assert res["preempted"] is True and res["steps"] == 0
    assert os.path.exists(os.path.join(out, "train_state.safetensors"))
    assert not os.path.exists(os.path.join(out, "lora_weight.safetensors"))


@pytest.mark.slow
def test_pti_preemption_stops_whole_run(pipe, image_dir, tmp_path,
                                        monkeypatch):
    """SIGTERM during PTI phase 1 must stop the WHOLE run (regression: the
    next phase used to start with a fresh guard and keep training) and must
    not write the final artifact."""
    import dataclasses

    from lora_tpu.training import checkpoint as ckpt

    class _Preempted(ckpt.PreemptionGuard):
        def __enter__(self):
            super().__enter__()
            self.should_stop = True
            return self

    monkeypatch.setattr(ckpt, "PreemptionGuard", _Preempted)
    out = str(tmp_path / "pti_preempt")
    cfg = PTIConfig(
        instance_data_dir=image_dir, output_dir=out,
        placeholder_tokens="<s1>", use_template="object", resolution=64,
        lora_rank=2, max_train_steps_ti=5, max_train_steps_tuning=5,
        save_steps=0, cached_latents=True, seed=2)
    p = dataclasses.replace(pipe)
    p.tokenizer = type(pipe.tokenizer)(vocab_size=TINY_TEXT.vocab_size)
    res = train_pti(p, cfg)
    assert res["preempted"] is True
    assert os.path.exists(os.path.join(out, "step_inv_0.safetensors"))
    assert not os.path.exists(os.path.join(out, "final_lora.safetensors"))


def test_pti_locon_pair_convention(pipe, image_dir, tmp_path):
    """lora_targets='locon': two-phase PTI over the LoCon superset saves the
    webui pair — <name>.safetensors (kohya schema, patch_pipe-loadable) +
    <name>.embeds.pt (A1111 textual embedding, token id 265) — since the
    kohya file cannot carry TI embeds (VERDICT r3 item 3; reference bar
    cli_lora_pti.py:696 + cli_lora_add.py:129-168)."""
    import dataclasses

    import torch

    from lora_tpu.formats.pt_io import load_a1111_embedding

    out = str(tmp_path / "pti_locon")
    cfg = PTIConfig(
        instance_data_dir=image_dir,
        output_dir=out,
        placeholder_tokens="<s1>|<s2>",
        use_template="object",
        resolution=64,
        lora_rank=2,
        max_train_steps_ti=2,
        max_train_steps_tuning=2,
        save_steps=2,
        gradient_accumulation_steps=1,
        cached_latents=True,
        train_text_encoder=True,
        continue_inversion=True,
        lora_targets="locon",
        seed=5,
    )
    p = dataclasses.replace(pipe)
    p.tokenizer = type(pipe.tokenizer)(vocab_size=TINY_TEXT.vocab_size)
    res = train_pti(p, cfg)
    assert np.isfinite(res["final_loss"])

    final = os.path.join(out, "final_lora.safetensors")
    # kohya schema with conv (LoCon) modules present
    from lora_tpu.formats.reader import SafetensorsFile
    with SafetensorsFile(final) as f:
        keys = f.keys()
    assert any(k.startswith("lora_unet_") for k in keys)
    assert any(k.startswith("lora_te_") for k in keys)
    assert any("resnets" in k or "conv" in k for k in keys), \
        "locon training must reach conv sites"

    # the A1111 sidecar: standard webui keys + exact per-token round-trip
    emb_path = os.path.join(out, "final_lora.embeds.pt")
    raw = torch.load(emb_path, map_location="cpu", weights_only=False)
    assert raw["string_to_token"] == {"*": 265}
    assert raw["string_to_param"]["*"].shape[0] == 2
    name, emb = load_a1111_embedding(emb_path)
    assert name == "final_lora" and set(emb) == {"<s1>", "<s2>"}
    learned = res["trainable"]["ti"]["embeds"]
    np.testing.assert_allclose(emb["<s1>"], np.asarray(learned[0]),
                               rtol=1e-6)

    # intermediate saves follow the same pair convention
    assert os.path.exists(os.path.join(out, "step_2.safetensors"))
    assert os.path.exists(os.path.join(out, "step_2.embeds.pt"))

    # the kohya artifact loads back through patch_pipe autodetection and
    # applies (conv sites included)
    p2 = dataclasses.replace(pipe)
    p2.patch_pipe(final)
    assert p2.lora_unet is not None and p2.lora_text is not None
    assert any(s.endswith(("conv1", "conv2", "conv_shortcut"))
               or ".conv" in s for s in p2.lora_unet["sites"])


def test_pti_locon_conflicts_with_extended(pipe):
    import dataclasses

    cfg = PTIConfig(lora_targets="locon", use_extended_lora=True,
                    placeholder_tokens="<s1>")
    with pytest.raises(ValueError, match="conflicts"):
        train_pti(dataclasses.replace(pipe), cfg)


# -- SDXL DreamBooth training -------------------------------------------------

@pytest.fixture(scope="module")
def xl_pipe():
    from lora_tpu.models.config import (
        TINY_VAE as _VAE,
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    return StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=_VAE)


def test_dreambooth_xl_end_to_end(xl_pipe, image_dir, tmp_path):
    """SDXL DreamBooth-LoRA: dual text encoders train, the artifact goes
    out in the kohya-XL schema (lora_unet_ LDM names + lora_te1_/lora_te2_)
    and patches back onto the XL pipeline."""
    import dataclasses

    out = str(tmp_path / "dbxl_out")
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir,
        output_dir=out,
        instance_prompt="a photo of sks dog",
        resolution=64,
        lora_rank=2,
        max_train_steps=2,
        save_steps=0,
        train_text_encoder=True,
        output_format="safe",
        seed=0,
    )
    res = train_dreambooth(dataclasses.replace(xl_pipe), cfg)
    assert res["steps"] == 2
    assert np.isfinite(res["final_loss"])
    path = os.path.join(out, "lora_weight.safetensors")
    assert os.path.exists(path)
    # all three models present in the kohya-XL schema
    from lora_tpu.formats.kohya import is_kohya_xl
    from lora_tpu.formats.reader import SafetensorsFile

    with SafetensorsFile(path) as f:
        keys = list(f.keys())
    assert is_kohya_xl(keys)
    assert any(k.startswith("lora_unet_input_blocks_") for k in keys)
    assert any(k.startswith("lora_te1_") for k in keys)
    assert any(k.startswith("lora_te2_") for k in keys)

    # patches back onto the XL pipeline and changes the render
    p = dataclasses.replace(xl_pipe)
    base = p("a sks dog", num_inference_steps=2, height=32, width=32,
             rng=jax.random.PRNGKey(3))
    p.patch_pipe(path)
    assert p.lora_unet is not None
    assert p.lora_text is not None and p.lora_text2 is not None
    patched = p("a sks dog", num_inference_steps=2, height=32, width=32,
                rng=jax.random.PRNGKey(3))
    assert np.isfinite(patched).all()
    assert np.abs(patched - base).max() > 0


def test_dreambooth_xl_cached_text_matches_uncached_loss(xl_pipe, image_dir,
                                                         tmp_path):
    """The XL frozen-text fast path (cached dual-encode + pooled) must give
    the same first-step loss as encoding inside the jitted step."""
    import dataclasses

    losses = []
    for cache, tag in ((True, "c"), (False, "u")):
        cfg = DreamBoothConfig(
            instance_data_dir=image_dir,
            output_dir=str(tmp_path / f"dbxl_{tag}"),
            instance_prompt="a photo of sks dog",
            resolution=64,
            lora_rank=2,
            max_train_steps=1,
            save_steps=0,
            cache_text_embeddings=cache,
            output_format="safe",
            seed=0,
        )
        res = train_dreambooth(dataclasses.replace(xl_pipe), cfg)
        losses.append(res["final_loss"])
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)


def test_dreambooth_xl_rejects_pt_output(xl_pipe, image_dir, tmp_path):
    cfg = DreamBoothConfig(
        instance_data_dir=image_dir, output_dir=str(tmp_path / "o"),
        instance_prompt="x", resolution=64, max_train_steps=1,
        output_format="both")
    with pytest.raises(ValueError, match="kohya-XL"):
        train_dreambooth(xl_pipe, cfg)


def test_ids2_from_ids_zero_pads_after_eos():
    from lora_tpu.training.loss import ids2_from_ids

    eos = 9
    ids = np.asarray([[1, 4, 2, eos, eos, eos],
                      [1, eos, eos, eos, eos, eos]], np.int64)
    out = np.asarray(ids2_from_ids(ids, eos))
    np.testing.assert_array_equal(
        out, [[1, 4, 2, eos, 0, 0], [1, eos, 0, 0, 0, 0]])
    # jax path agrees
    import jax.numpy as jnp

    out_j = np.asarray(ids2_from_ids(jnp.asarray(ids), eos))
    np.testing.assert_array_equal(out, out_j)


def test_dreambooth_xl_per_image_time_ids(xl_pipe, tmp_path, monkeypatch):
    """Uncached SDXL training feeds PER-IMAGE original-size/crop rows into
    add_time_ids (upstream XL trainers' micro-conditioning), not the
    constant training-resolution row; cached latents keep the constant
    fallback."""
    import dataclasses

    import lora_tpu.training.dreambooth as db

    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(7)
    # one landscape, one portrait — distinct geometry rows at size 64
    Image.fromarray((rs.rand(80, 120, 3) * 255).astype(np.uint8)).save(
        d / "wide.jpg")
    Image.fromarray((rs.rand(120, 80, 3) * 255).astype(np.uint8)).save(
        d / "tall.jpg")

    captured = []
    orig = db.make_train_step

    def spy(**kw):
        fn = orig(**kw)

        def wrapped(trainable, opt_state, base, batch, rng):
            captured.append(np.asarray(batch["add_time_ids"]))
            return fn(trainable, opt_state, base, batch, rng)

        return wrapped

    monkeypatch.setattr(db, "make_train_step", spy)

    cfg = DreamBoothConfig(
        instance_data_dir=str(d), output_dir=str(tmp_path / "o"),
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=6, save_steps=0, output_format="safe", seed=0)
    res = db.train_dreambooth(dataclasses.replace(xl_pipe), cfg)
    assert np.isfinite(res["final_loss"])
    rows = {tuple(r) for b in captured for r in b}
    # resize-short to 64: wide -> (64, 96) crop left 16; tall -> top 16
    assert (80, 120, 0, 16, 64, 64) in rows
    assert (120, 80, 16, 0, 64, 64) in rows
    assert (64, 64, 0, 0, 64, 64) not in rows

    # cached latents: constant training-res fallback
    captured.clear()
    cfg2 = dataclasses.replace(cfg, cached_latents=True,
                               output_dir=str(tmp_path / "o2"),
                               max_train_steps=2)
    db.train_dreambooth(dataclasses.replace(xl_pipe), cfg2)
    rows2 = {tuple(r) for b in captured for r in b}
    assert rows2 == {(64, 64, 0, 0, 64, 64)}


def test_dreambooth_xl_geometry_on_mesh(xl_pipe, tmp_path):
    """The per-image time_ids geometry survives the sharded uncached
    loader: XL training on a dp=2 x fsdp=2 virtual mesh with mixed-size
    images runs and stays finite (time_ids_geom flows through
    device_prefetch's batch sharding and _local_rows)."""
    import dataclasses

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(9)
    Image.fromarray((rs.rand(80, 120, 3) * 255).astype(np.uint8)).save(
        d / "wide.jpg")
    Image.fromarray((rs.rand(120, 80, 3) * 255).astype(np.uint8)).save(
        d / "tall.jpg")
    cfg = DreamBoothConfig(
        instance_data_dir=str(d), output_dir=str(tmp_path / "o"),
        instance_prompt="a photo of sks dog", resolution=64, lora_rank=2,
        max_train_steps=2, save_steps=0, output_format="safe", seed=0,
        data_parallel=True, fsdp=2)
    res = train_dreambooth(dataclasses.replace(xl_pipe), cfg)
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])
