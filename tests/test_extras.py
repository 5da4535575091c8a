"""Legacy TI+LoRA trainer, inpainting (train + sample), gradient
checkpointing equivalence."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import StableDiffusionPipeline

TINY_UNET_INPAINT = dataclasses.replace(TINY_UNET, in_channels=9)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs2")
    rs = np.random.RandomState(1)
    for i in range(2):
        Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            d / f"img{i}.jpg")
    return str(d)


def test_remat_matches_no_remat():
    from lora_tpu.models.unet import init_unet, unet_forward

    p = init_unet(TINY_UNET, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 7, TINY_UNET.cross_attention_dim))
    a = unet_forward(p, x, t, ctx, TINY_UNET, remat=False)
    b = unet_forward(p, x, t, ctx, TINY_UNET, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)
    # grads flow through the remat path
    import lora_tpu.core.lora as lc
    from lora_tpu.core.sites import unet_lora_sites

    lora = lc.init_lora(unet_lora_sites(TINY_UNET), r=2,
                        rng=jax.random.PRNGKey(3))
    g = jax.grad(lambda l: jnp.sum(
        unet_forward(p, x, t, ctx, TINY_UNET, lora=l, remat=True) ** 2))(lora)
    up0 = next(iter(g["sites"].values()))["up"]
    assert np.abs(np.asarray(up0)).max() > 0


def test_legacy_ti_trainer(image_dir, tmp_path):
    from lora_tpu.training.ti_legacy import LegacyTiConfig, train_ti_lora_legacy

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    out = str(tmp_path / "ti_out")
    cfg = LegacyTiConfig(
        instance_data_dir=image_dir, output_dir=out,
        placeholder_token="<krk>", resolution=64, lora_rank=2,
        max_train_steps=4, unfreeze_lora_step=2, save_steps=0, seed=0)
    res = train_ti_lora_legacy(pipe, cfg)
    assert np.isfinite(res["final_loss"])
    assert os.path.exists(os.path.join(out, "lora_ti_final.safetensors"))
    tr = res["trainable"]
    # TI moved during phase 1, LoRA moved during phase 2
    assert np.abs(np.asarray(tr["ti"]["embeds"])).max() > 0
    ups = [np.abs(np.asarray(e["up"])).max()
           for e in tr["lora_unet"]["sites"].values()]
    assert max(ups) > 0  # unfroze and trained

    from lora_tpu.formats.safetensors_io import load_safeloras_both

    loras, embeds = load_safeloras_both(
        os.path.join(out, "lora_ti_final.safetensors"))
    assert "<krk>" in embeds and "unet" in loras


def test_inpaint_training_and_sampling(image_dir, tmp_path):
    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import unet_lora_sites
    from lora_tpu.data.dataset import PivotalTuningDataset, data_loader
    from lora_tpu.models import schedulers
    from lora_tpu.training.loss import LossConfig, loss_step

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET_INPAINT, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)

    ds = PivotalTuningDataset(
        image_dir, pipe.tokenizer, token_map={"DUMMY": "<s1>"},
        use_template="object", size=64, train_inpainting=True, seed=0)
    loader = data_loader(ds, 1, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
    assert "mask_values" in batch and "masked_image_values" in batch

    lora = init_lora(unet_lora_sites(TINY_UNET_INPAINT), r=2,
                     rng=jax.random.PRNGKey(1))
    loss = loss_step(
        {"lora_unet": lora}, batch, jax.random.PRNGKey(2),
        unet_params=pipe.unet_params, text_params=pipe.text_params,
        vae_params=pipe.vae_params, unet_cfg=TINY_UNET_INPAINT,
        text_cfg=TINY_TEXT, vae_cfg=TINY_VAE,
        sched=schedulers.make_schedule(),
        cfg=LossConfig(cached_latents=False, train_inpainting=True))
    assert np.isfinite(float(loss))

    # inference: 9-channel inpaint sampling
    img = jnp.zeros((1, 64, 64, 3)) + 0.1
    mask = jnp.zeros((1, 64, 64, 1)).at[:, 16:48, 16:48].set(1.0)
    out = pipe.inpaint("a thing", img, mask, num_inference_steps=2)
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()


def test_inpaint_requires_9ch(image_dir):
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    with pytest.raises(AssertionError):
        pipe.inpaint("x", jnp.zeros((1, 64, 64, 3)),
                     jnp.zeros((1, 64, 64, 1)), num_inference_steps=1)


@pytest.mark.slow
def test_legacy_ti_trainer_preemption(image_dir, tmp_path, monkeypatch):
    """SIGTERM stops the legacy trainer cleanly: preempt artifact saved,
    final artifact NOT written, preempted=True."""
    from lora_tpu.training import checkpoint as ckpt
    from lora_tpu.training.ti_legacy import LegacyTiConfig, train_ti_lora_legacy

    class _Preempted(ckpt.PreemptionGuard):
        def __enter__(self):
            super().__enter__()
            self.should_stop = True
            return self

    monkeypatch.setattr(ckpt, "PreemptionGuard", _Preempted)
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    out = str(tmp_path / "ti_preempt")
    cfg = LegacyTiConfig(
        instance_data_dir=image_dir, output_dir=out,
        placeholder_token="<krk>", resolution=64, lora_rank=2,
        max_train_steps=4, unfreeze_lora_step=2, save_steps=0, seed=0)
    res = train_ti_lora_legacy(pipe, cfg)
    assert res["preempted"] is True
    assert os.path.exists(os.path.join(out, "lora_ti_preempt_0.safetensors"))
    assert not os.path.exists(os.path.join(out, "lora_ti_final.safetensors"))


def test_image_grid_uniform_and_mixed_sizes():
    """Mixed-size inputs are resized to the first image's size (the
    paste-based reference tolerated them; the block-reshape must too)."""
    import numpy as np
    from PIL import Image

    from lora_tpu.utils.eval import image_grid

    a = Image.fromarray(np.full((8, 6, 3), 10, np.uint8))
    b = Image.fromarray(np.full((8, 6, 3), 200, np.uint8))
    g = image_grid([a, b], rows=1, cols=2)
    assert g.size == (12, 8)  # (w, h)
    arr = np.asarray(g)
    assert (arr[:, :6] == 10).all() and (arr[:, 6:] == 200).all()

    c = Image.fromarray(np.full((16, 16, 3), 99, np.uint8))  # stray size
    g2 = image_grid([a, c], rows=2, cols=1)
    assert g2.size == (6, 16)
    assert (np.asarray(g2)[8:] == 99).all()
