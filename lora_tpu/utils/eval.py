"""Evaluation harness (reference utils.py): the 32 canonical <obj> prompt
templates, image grids, CLIP text-/image-alignment scores (textual-inversion
paper methodology), evaluate_pipe, and visualize_progress.

CLIP scoring needs a vision tower; it loads a local torch CLIP checkpoint
(LORA_TPU_AUX_MODELS/clip) — host-side, not in the TPU hot path. Without
one, evaluate_pipe still runs generation and returns image stats with the
alignment fields omitted.
"""

from __future__ import annotations

import glob
import math
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

EXAMPLE_PROMPTS = [
    "<obj> swimming in a pool",
    "<obj> at a beach with a view of seashore",
    "<obj> in times square",
    "<obj> wearing sunglasses",
    "<obj> in a construction outfit",
    "<obj> playing with a ball",
    "<obj> wearing headphones",
    "an oil painting of <obj> in the style of van gogh",
    "<obj> with the Eiffel Tower in the background",
    "<obj> near a body of water",
    "<obj> riding a bicycle",
    "<obj> wearing a red hat",
    "<obj> is playing the guitar",
    "<obj> reading a book",
    "<obj> eating a burger",
    "<obj> drinking a soda",
    "<obj> playing with a kite",
    "<obj> in a chef outfit",
    "<obj> as a firefighter",
    "<obj> as a police officer",
    "<obj> wearing a birthday hat",
    "<obj> on a boat in the sea",
    "<obj> in a supermarket",
    "<obj> at a park",
    "<obj> in the snow",
    "<obj> surfing a wave",
    "<obj> in the jungle",
    "<obj> in the desert",
    "<obj> climbing a mountain",
    "<obj> under a starry sky",
    "<obj> in a library full of books",
    "<obj> dancing in the rain",
]


def image_grid(imgs: List[Image.Image], rows: Optional[int] = None,
               cols: Optional[int] = None) -> Image.Image:
    """Tile equally-sized images into a rows x cols contact sheet
    (role of reference utils.py:54-70), as one numpy block-reshape."""
    n = len(imgs)
    if rows is None and cols is None:
        rows = cols = math.ceil(n ** 0.5)
    elif rows is None:
        rows = math.ceil(n / cols)
    elif cols is None:
        cols = math.ceil(n / rows)
    h, w = np.asarray(imgs[0]).shape[:2]
    # tolerate mixed sizes (the paste-based reference did): resize strays
    # to the first image's size rather than raising from the block assign
    imgs = [im if im.size == (w, h) else im.resize((w, h)) for im in imgs]
    sheet = np.zeros((rows * cols, h, w, 3), np.uint8)
    sheet[:n] = [np.asarray(im.convert("RGB")) for im in imgs]
    sheet = (sheet.reshape(rows, cols, h, w, 3)
             .transpose(0, 2, 1, 3, 4).reshape(rows * h, cols * w, 3))
    return Image.fromarray(sheet)


def to_pil(arr: np.ndarray) -> Image.Image:
    """(H, W, 3) float [0,1] -> PIL."""
    return Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))


def prepare_clip_model_sets(model_dir: Optional[str] = None):
    """Load a local CLIP for alignment scoring (reference utils.py:103-109);
    None when unavailable."""
    model_dir = model_dir or os.environ.get("LORA_TPU_AUX_MODELS")
    if model_dir:
        model_dir = os.path.join(model_dir, "clip")
    if not model_dir or not os.path.isdir(model_dir):
        return None
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(model_dir)
    processor = CLIPProcessor.from_pretrained(model_dir)
    return model, processor


def text_img_alignment(img_embeds, text_embeds, target_img_embeds):
    """Textual-inversion-paper alignment scores (reference utils.py:73-100)."""
    import torch

    def norm(x):
        return x / x.norm(dim=-1, keepdim=True)

    img_embeds, text_embeds = norm(img_embeds), norm(text_embeds)
    target_img_embeds = norm(target_img_embeds)
    text_alignment = (img_embeds @ text_embeds.T).mean().item()
    img_alignment = (img_embeds @ target_img_embeds.T).mean().item()
    return {"text_alignment_avg": text_alignment,
            "image_alignment_avg": img_alignment}


def clip_alignment_scores_jax(gen_images, prompts, target_images,
                              clip_params, vision_cfg, text_cfg,
                              tokenizer) -> Dict[str, float]:
    """Text/image alignment with the in-framework JAX CLIP
    (models/clip_vision.py) — no torch in the scoring path."""
    import jax.numpy as jnp

    from ..models.clip_vision import (
        get_image_features,
        get_text_features,
        preprocess_images,
    )

    def norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    img_e = norm(get_image_features(
        clip_params, preprocess_images(gen_images, vision_cfg.image_size),
        vision_cfg))
    ids = jnp.asarray(tokenizer(prompts)["input_ids"])
    txt_e = norm(get_text_features(clip_params, ids, text_cfg))
    tgt_e = norm(get_image_features(
        clip_params, preprocess_images(target_images, vision_cfg.image_size),
        vision_cfg))
    return {
        "text_alignment_avg": float((img_e @ txt_e.T).mean()),
        "image_alignment_avg": float((img_e @ tgt_e.T).mean()),
    }


def evaluate_pipe(
    pipe,
    target_images: List[Image.Image],
    class_token: str = "",
    learnt_token: str = "",
    guidance_scale: float = 5.0,
    seed: int = 0,
    clip_model_sets=None,
    n_test: int = 10,
    n_step: int = 50,
) -> Dict[str, float]:
    """Generate images over the canonical prompts and score CLIP alignment
    (reference utils.py:112-163)."""
    import jax

    results: Dict[str, float] = {}
    gen_images: List[Image.Image] = []
    prompts: List[str] = []
    for i, template in enumerate(EXAMPLE_PROMPTS[:n_test]):
        prompt = template.replace("<obj>", learnt_token)
        imgs = pipe(prompt, num_inference_steps=n_step,
                    guidance_scale=guidance_scale,
                    rng=jax.random.PRNGKey(seed + i))
        gen_images.append(to_pil(imgs[0]))
        prompts.append(template.replace("<obj>", class_token))

    if isinstance(clip_model_sets, dict):  # in-framework JAX CLIP scorer
        results.update(clip_alignment_scores_jax(
            gen_images, prompts, target_images,
            clip_model_sets["params"], clip_model_sets["vision_cfg"],
            clip_model_sets["text_cfg"], clip_model_sets["tokenizer"]))
    elif clip_model_sets is not None:  # local torch CLIP checkpoint
        import torch

        model, processor = clip_model_sets
        with torch.no_grad():
            inp = processor(images=gen_images, return_tensors="pt")
            img_embeds = model.get_image_features(**inp)
            inp = processor(text=prompts, return_tensors="pt", padding=True,
                            truncation=True)
            text_embeds = model.get_text_features(**inp)
            inp = processor(images=target_images, return_tensors="pt")
            target_embeds = model.get_image_features(**inp)
        results.update(text_img_alignment(img_embeds, text_embeds,
                                          target_embeds))
    arr = np.stack([np.asarray(im, np.float32) for im in gen_images])
    results["gen_mean"] = float(arr.mean())
    results["gen_std"] = float(arr.std())
    results["n_images"] = len(gen_images)
    return results


def visualize_progress(
    path_alls: str,
    prompt: str,
    pipe,
    n_imgs: int = 50,
    seed: int = 0,
    num_inference_steps: int = 50,
    guidance_scale: float = 5.0,
    offset: int = 0,
    limit: int = 10,
    height: int = 512,
    width: int = 512,
) -> List[Image.Image]:
    """Render the same prompt/seed across checkpoint history
    (reference utils.py:166-214)."""
    import jax

    imgs: List[Image.Image] = []
    alls = sorted(glob.glob(path_alls))[offset:limit]
    print(f"Found {len(alls)} checkpoints")
    for ckpt in alls:
        pipe.patch_pipe(ckpt)
        out = pipe(prompt, num_inference_steps=num_inference_steps,
                   guidance_scale=guidance_scale,
                   rng=jax.random.PRNGKey(seed),
                   height=height, width=width)
        imgs.append(to_pil(out[0]))
    return imgs
