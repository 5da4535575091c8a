"""JAX CLIP vision tower + alignment scoring."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from lora_tpu.data.tokenizer import CLIPTokenizer
from lora_tpu.models.clip import init_clip_text
from lora_tpu.models.clip_vision import (
    TINY_VISION,
    get_image_features,
    get_text_features,
    init_clip_vision,
    preprocess_images,
)
from lora_tpu.models.config import TINY_TEXT
from lora_tpu.utils.eval import clip_alignment_scores_jax


def test_vision_forward_shapes():
    p = init_clip_vision(TINY_VISION, jax.random.PRNGKey(0))
    # HF key-name compat (incl. the upstream pre_layrnorm typo)
    assert "vision_model.pre_layrnorm.weight" in p
    assert "vision_model.embeddings.patch_embedding.weight" in p
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    feats = get_image_features(p, x, TINY_VISION)
    assert feats.shape == (2, TINY_VISION.projection_dim)
    assert bool(jnp.isfinite(feats).all())


def test_text_features_eos_pooled():
    p = init_clip_text(TINY_TEXT, jax.random.PRNGKey(2))
    d = TINY_TEXT.hidden_size
    p["text_projection.weight"] = jax.random.normal(
        jax.random.PRNGKey(3), (16, d)) * 0.02
    ids = jnp.array([[5, 7, 999, 999], [3, 4, 6, 999]])  # 999 = eos-ish max
    feats = get_text_features(p, ids, TINY_TEXT)
    assert feats.shape == (2, 16)


def test_alignment_scores_pipeline():
    vp = init_clip_vision(TINY_VISION, jax.random.PRNGKey(4))
    tp = init_clip_text(TINY_TEXT, jax.random.PRNGKey(5))
    params = {**vp, **tp,
              "text_projection.weight": jax.random.normal(
                  jax.random.PRNGKey(6),
                  (TINY_VISION.projection_dim, TINY_TEXT.hidden_size)) * 0.02}
    tok = CLIPTokenizer(vocab_size=TINY_TEXT.vocab_size)
    rs = np.random.RandomState(0)
    imgs = [Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8))
            for _ in range(2)]
    scores = clip_alignment_scores_jax(
        imgs, ["a dog", "a cat"], imgs, params, TINY_VISION, TINY_TEXT, tok)
    assert set(scores) == {"text_alignment_avg", "image_alignment_avg"}
    assert -1.0 <= scores["text_alignment_avg"] <= 1.0
    # identical gen/target images -> image alignment contains perfect self-sim
    assert scores["image_alignment_avg"] > 0.4


def test_preprocess_images_normalization():
    img = Image.fromarray(np.full((50, 40, 3), 128, np.uint8))
    out = preprocess_images([img], 28)
    assert out.shape == (1, 28, 28, 3)
    # 0.5 gray under CLIP normalization
    expect = (0.50196 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), expect, atol=1e-3)


def test_evaluate_pipe_with_jax_scorer():
    """evaluate_pipe end-to-end: tiny pipe generation + the in-framework
    JAX CLIP alignment scorer (no torch checkpoint needed)."""
    from lora_tpu.models.config import TINY_UNET, TINY_VAE
    from lora_tpu.pipelines.sd import StableDiffusionPipeline
    from lora_tpu.utils.eval import evaluate_pipe

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    vp = init_clip_vision(TINY_VISION, jax.random.PRNGKey(4))
    tp = init_clip_text(TINY_TEXT, jax.random.PRNGKey(5))
    sets = {
        "params": {**vp, **tp,
                   "text_projection.weight": jax.random.normal(
                       jax.random.PRNGKey(6),
                       (TINY_VISION.projection_dim,
                        TINY_TEXT.hidden_size)) * 0.02},
        "vision_cfg": TINY_VISION, "text_cfg": TINY_TEXT,
        "tokenizer": pipe.tokenizer,
    }
    rs = np.random.RandomState(1)
    targets = [Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))]
    scores = evaluate_pipe(pipe, targets, class_token="dog",
                           learnt_token="<s1>", clip_model_sets=sets,
                           n_test=2, n_step=2)
    assert scores["n_images"] == 2
    assert "text_alignment_avg" in scores and "image_alignment_avg" in scores
    assert np.isfinite(scores["text_alignment_avg"])
