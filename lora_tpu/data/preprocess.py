"""Dataset preprocessing pipeline — the `lora_ppim` capability
(reference preprocess_files.py): BLIP auto-captioning, CLIPSeg concept
masks, mediapipe face masks, SwinIR super-resolution, salience-centered
square crop, and the {i}.src.jpg / {i}.mask.png / caption.txt output layout.

The aux models are host-side (not in the TPU hot path) and loaded lazily
from local checkpoints (zero-egress environments can't download); every
model-backed stage has a deterministic pure-numpy fallback so the pipeline
always produces a usable dataset:
  - captions fall back to a fixed caption template
  - masks fall back to a centered soft ellipse (or full-ones)
  - super-resolution falls back to bicubic upscale
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple, Union

import numpy as np
from PIL import Image, ImageFilter


# ---------------------------------------------------------------------------
# pure-numpy helpers (full implementations)
# ---------------------------------------------------------------------------

def _center_of_mass(mask: Image.Image) -> Tuple[float, float]:
    """Intensity-weighted centroid (x, y) of a grayscale mask
    (preprocess_files.py:203-213)."""
    arr = np.asarray(mask, np.float32)
    total = arr.sum()
    if total <= 0:
        return mask.size[0] / 2, mask.size[1] / 2
    ys, xs = np.indices(arr.shape)
    return float((xs * arr).sum() / total), float((ys * arr).sum() / total)


def _crop_to_square(img: Image.Image, com: Tuple[float, float],
                    resize_to: Optional[int] = None) -> Image.Image:
    """Square crop centered (as much as possible) on the salience point
    (preprocess_files.py:216-241)."""
    cx, cy = com
    w, h = img.size
    # the crop box stays FLOAT: PIL rounds it internally, and the reference
    # passes floats too (preprocess_files.py:221-229) — pre-truncating with
    # int() shifted every crop by up to a pixel vs the reference
    # (caught by tests/test_reference_interop.py)
    if w > h:
        left = min(max(cx - h / 2, 0), w - h)
        img = img.crop((left, 0, left + h, h))
    elif h > w:
        top = min(max(cy - w / 2, 0), h - w)
        img = img.crop((0, top, w, top + w))
    if resize_to:
        img = img.resize((resize_to, resize_to), Image.LANCZOS)
    return img


def _ellipse_mask(size: Tuple[int, int], blur_amount: float = 80.0) -> Image.Image:
    """Fallback saliency mask: soft centered ellipse."""
    w, h = size
    ys, xs = np.indices((h, w)).astype(np.float32)
    d = (((xs - w / 2) / (w / 2.5)) ** 2 + ((ys - h / 2) / (h / 2.5)) ** 2)
    mask = (d < 1.0).astype(np.float32) * 255
    img = Image.fromarray(mask.astype(np.uint8), "L")
    return img.filter(ImageFilter.GaussianBlur(blur_amount / 8))


# ---------------------------------------------------------------------------
# model-backed stages (lazy, gated, with fallbacks)
# ---------------------------------------------------------------------------

def _aux_model_dir(name: str) -> Optional[str]:
    base = os.environ.get("LORA_TPU_AUX_MODELS")
    if base and os.path.isdir(os.path.join(base, name)):
        return os.path.join(base, name)
    return None


def blip_captioning_dataset(
    images: List[Image.Image],
    text: Optional[str] = None,
    model_dir: Optional[str] = None,
    fallback_caption: str = "a photo of a person",
) -> List[str]:
    """BLIP captions (preprocess_files.py:122-151); falls back to a constant
    caption when no local BLIP checkpoint is available."""
    model_dir = model_dir or _aux_model_dir("blip")
    if model_dir is None:
        return [fallback_caption] * len(images)
    import torch
    from transformers import BlipForConditionalGeneration, BlipProcessor

    processor = BlipProcessor.from_pretrained(model_dir)
    model = BlipForConditionalGeneration.from_pretrained(model_dir)
    captions = []
    with torch.no_grad():
        for img in images:
            inputs = processor(img, text=text, return_tensors="pt")
            out = model.generate(**inputs, max_length=150, do_sample=True,
                                 top_k=50, temperature=0.7)
            captions.append(processor.decode(out[0], skip_special_tokens=True))
    return captions


def clipseg_mask_generator(
    images: List[Image.Image],
    target_prompts: Union[str, List[str]],
    model_dir: Optional[str] = None,
    bias: float = 0.01,
    temp: float = 1.0,
) -> List[Image.Image]:
    """CLIPSeg concept masks (preprocess_files.py:64-119); ellipse fallback."""
    if isinstance(target_prompts, str):
        target_prompts = [target_prompts] * len(images)
    model_dir = model_dir or _aux_model_dir("clipseg")
    if model_dir is None:
        return [_ellipse_mask(img.size) for img in images]
    import torch
    from transformers import CLIPSegForImageSegmentation, CLIPSegProcessor

    processor = CLIPSegProcessor.from_pretrained(model_dir)
    model = CLIPSegForImageSegmentation.from_pretrained(model_dir)
    masks = []
    with torch.no_grad():
        for img, prompt in zip(images, target_prompts):
            original_size = img.size
            # truncation hardening over the reference (preprocess_files.py:
            # 98-100): the driver feeds BLIP captions in as target prompts,
            # and a caption longer than CLIP's 77 positions would crash the
            # text tower; published-weight captions are short so behavior is
            # unchanged there
            inputs = processor(text=[prompt], images=[img], padding="max_length",
                               truncation=True, return_tensors="pt")
            outputs = model(**inputs)
            logits = outputs.logits
            probs = torch.sigmoid(logits / temp)
            probs = (probs + bias).clamp_(0, 1) * 255
            mask = Image.fromarray(probs.squeeze().numpy().astype(np.uint8),
                                   "L").resize(original_size)
            masks.append(mask)
    return masks


def face_mask_google_mediapipe(
    images: List[Image.Image], blur_amount: float = 80.0, bias: float = 0.05
) -> List[Image.Image]:
    """Face masks via mediapipe when installed (preprocess_files.py:154-200);
    soft-ellipse fallback otherwise (dataset masking still works, just
    without face localization)."""
    try:
        import mediapipe as mp
    except ImportError:
        return [_ellipse_mask(img.size, blur_amount) for img in images]

    mp_face = mp.solutions.face_detection
    masks = []
    with mp_face.FaceDetection(model_selection=1,
                               min_detection_confidence=0.5) as fd:
        for img in images:
            arr = np.asarray(img.convert("RGB"))
            results = fd.process(arr)
            mask = Image.new("L", img.size, 0)
            if results.detections:
                import PIL.ImageDraw as ImageDraw

                draw = ImageDraw.Draw(mask)
                for det in results.detections:
                    bbox = det.location_data.relative_bounding_box
                    x1 = bbox.xmin * img.size[0]
                    y1 = bbox.ymin * img.size[1]
                    x2 = x1 + bbox.width * img.size[0]
                    y2 = y1 + bbox.height * img.size[1]
                    draw.rectangle([x1, y1, x2, y2], fill=255)
                mask = mask.filter(ImageFilter.GaussianBlur(blur_amount))
                arr = np.asarray(mask, np.float32) / 255
                arr = np.clip(arr + bias, 0, 1) * 255
                mask = Image.fromarray(arr.astype(np.uint8), "L")
            else:
                mask = _ellipse_mask(img.size, blur_amount)
            masks.append(mask)
    return masks


def swin_ir_sr(
    images: List[Image.Image],
    target_size: Optional[Tuple[int, int]] = None,
    model_dir: Optional[str] = None,
) -> List[Image.Image]:
    """Swin2SR 2x super-resolution for small images
    (preprocess_files.py:17-61); bicubic fallback."""
    model_dir = model_dir or _aux_model_dir("swin2sr")
    out = []
    if model_dir is None:
        for img in images:
            if target_size is not None and img.size[0] < target_size[0]:
                img = img.resize(target_size, Image.BICUBIC)
            out.append(img)
        return out
    import torch
    from transformers import AutoImageProcessor, Swin2SRForImageSuperResolution

    model = Swin2SRForImageSuperResolution.from_pretrained(model_dir)
    processor = AutoImageProcessor.from_pretrained(model_dir)
    with torch.no_grad():
        for img in images:
            if target_size is not None and img.size[0] >= target_size[0]:
                out.append(img)
                continue
            inputs = processor(img, return_tensors="pt")
            o = model(**inputs).reconstruction.squeeze().clamp_(0, 1)
            arr = (o.permute(1, 2, 0).numpy() * 255).astype(np.uint8)
            out.append(Image.fromarray(arr))
    return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def load_and_save_masks_and_captions(
    files: Union[str, List[str]],
    output_dir: str,
    caption_text: Optional[str] = None,
    target_prompts: Optional[Union[str, List[str]]] = None,
    target_size: int = 512,
    use_face_detection_instead: bool = False,
    temp: float = 1.0,
    n_length: int = -1,
):
    """The `lora_ppim` entry point (preprocess_files.py:244-327): caption ->
    mask -> salience crop -> SR -> save {i}.src.jpg/{i}.mask.png/caption.txt."""
    os.makedirs(output_dir, exist_ok=True)
    if isinstance(files, str):
        if os.path.isdir(files):
            files = sorted(
                os.path.join(files, f) for f in os.listdir(files)
                if f.lower().endswith((".png", ".jpg", ".jpeg")))
        else:
            import glob as _glob

            files = sorted(_glob.glob(files))
    if not files:
        raise ValueError("no input images found")
    if n_length > 0:
        files = files[:n_length]
    images = [Image.open(f).convert("RGB") for f in files]

    captions = blip_captioning_dataset(images, text=caption_text)
    if target_prompts is None:
        target_prompts = captions
    if use_face_detection_instead:
        seg_masks = face_mask_google_mediapipe(images)
    else:
        seg_masks = clipseg_mask_generator(images, target_prompts, temp=temp)

    coms = [_center_of_mass(m) for m in seg_masks]
    images = [_crop_to_square(img, com, resize_to=None)
              for img, com in zip(images, coms)]
    seg_masks = [_crop_to_square(m, com, resize_to=target_size)
                 for m, com in zip(seg_masks, coms)]
    images = swin_ir_sr(images, target_size=(target_size, target_size))
    images = [img.resize((target_size, target_size), Image.LANCZOS)
              for img in images]

    with open(os.path.join(output_dir, "caption.txt"), "w") as f:
        f.write("\n".join(captions))
    for i, (img, mask) in enumerate(zip(images, seg_masks)):
        img.save(os.path.join(output_dir, f"{i}.src.jpg"), quality=99)
        mask.save(os.path.join(output_dir, f"{i}.mask.png"))
    return captions
