"""Datasets for DreamBooth / pivotal-tuning training.

Reimplements the reference data layer (lora_diffusion/dataset.py) on
PIL + numpy, NHWC float32 in [-1, 1] (TPU layout; no torch/torchvision in
the input path).  Behaviors mirrored:

  - template banks (object/style/null) filled with the token_map value
    (dataset.py:12-70; templates originate from the textual-inversion paper)
  - captions from filename stems or caption.txt + {i}.src.jpg/{i}.mask.png
    pairs (use_mask_captioned_data), token_map string replacement
  - mask conditioning: mask transformed like the image then *0.5 + 1.0
    (dataset.py:277-283)
  - inpainting: random cutout-hole masks, 25% full-mask (dataset.py:91-123)
  - resize(bilinear, short side) -> optional color jitter -> center crop ->
    normalize; coupled random h-flip of image+mask
"""

from __future__ import annotations

import glob
import os
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

OBJECT_TEMPLATE = [
    "a photo of a {}",
    "a rendering of a {}",
    "a cropped photo of the {}",
    "the photo of a {}",
    "a photo of a clean {}",
    "a photo of a dirty {}",
    "a dark photo of the {}",
    "a photo of my {}",
    "a photo of the cool {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a cropped photo of a {}",
    "a photo of the {}",
    "a good photo of the {}",
    "a photo of one {}",
    "a close-up photo of the {}",
    "a rendition of the {}",
    "a photo of the clean {}",
    "a rendition of a {}",
    "a photo of a nice {}",
    "a good photo of a {}",
    "a photo of the nice {}",
    "a photo of the small {}",
    "a photo of the weird {}",
    "a photo of the large {}",
    "a photo of a cool {}",
    "a photo of a small {}",
]

STYLE_TEMPLATE = [
    "a painting in the style of {}",
    "a rendering in the style of {}",
    "a cropped painting in the style of {}",
    "the painting in the style of {}",
    "a clean painting in the style of {}",
    "a dirty painting in the style of {}",
    "a dark painting in the style of {}",
    "a picture in the style of {}",
    "a cool painting in the style of {}",
    "a close-up painting in the style of {}",
    "a bright painting in the style of {}",
    "a cropped painting in the style of {}",
    "a good painting in the style of {}",
    "a close-up painting in the style of {}",
    "a rendition in the style of {}",
    "a nice painting in the style of {}",
    "a small painting in the style of {}",
    "a weird painting in the style of {}",
    "a large painting in the style of {}",
]

NULL_TEMPLATE = ["{}"]

TEMPLATE_MAP = {
    "object": OBJECT_TEMPLATE,
    "style": STYLE_TEMPLATE,
    "null": NULL_TEMPLATE,
}


# ---------------------------------------------------------------------------
# image ops (PIL + numpy)
# ---------------------------------------------------------------------------

def _resize_short(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        nw, nh = size, max(int(round(h * size / w)), size)
    else:
        nh, nw = size, max(int(round(w * size / h)), size)
    return img.resize((nw, nh), Image.BILINEAR)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return arr[top : top + size, left : left + size]


def crop_geometry(orig_w: int, orig_h: int, size: int,
                  resize: bool = True) -> np.ndarray:
    """Per-image SDXL micro-conditioning geometry for the deterministic
    resize-short + center-crop transform above: [orig_h, orig_w, crop_top,
    crop_left] with crop offsets in POST-resize pixel space (the SDXL
    convention — original size + crop top-left feed the UNet's text_time
    add_embedding alongside the target size)."""
    if resize:
        if orig_w <= orig_h:
            nw, nh = size, max(int(round(orig_h * size / orig_w)), size)
        else:
            nh, nw = size, max(int(round(orig_w * size / orig_h)), size)
    else:
        nh, nw = orig_h, orig_w
    top = max((nh - size) // 2, 0)
    left = max((nw - size) // 2, 0)
    return np.asarray([orig_h, orig_w, top, left], np.float32)


def _color_jitter(arr: np.ndarray, rng: random.Random,
                  brightness=0.1, contrast=0.1) -> np.ndarray:
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    out = arr * b
    mean = out.mean()
    return np.clip((out - mean) * c + mean, 0.0, 1.0)


def _native_imgops():
    if os.environ.get("LORA_TPU_NATIVE_IMGOPS") != "1":
        return None
    from ..native.build import get_imgops

    return get_imgops()


def load_image_norm(path_or_img, size: int, resize: bool = True,
                    color_jitter: bool = False,
                    rng: Optional[random.Random] = None) -> np.ndarray:
    """-> (size, size, C) float32 in [-1, 1]."""
    img = (Image.open(path_or_img) if isinstance(path_or_img, (str, Path))
           else path_or_img)
    if img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    if resize and not color_jitter:
        # native fused resize+crop+normalize (opt-in: LORA_TPU_NATIVE_IMGOPS=1)
        mod = _native_imgops()
        if mod is not None:
            arr = np.asarray(img, np.uint8)
            if arr.ndim == 2:
                arr = arr[..., None]
            h, w, c = arr.shape
            out = mod.resize_crop_normalize(arr.tobytes(), h, w, c, size)
            return np.frombuffer(out, np.float32).reshape(size, size, c).copy()
    if resize:
        img = _resize_short(img, size)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    if color_jitter and rng is not None:
        arr = _color_jitter(arr, rng)
    arr = _center_crop(arr, size)
    return arr * 2.0 - 1.0


def _get_cutout_holes(height, width, rng: random.Random, min_holes=8,
                      max_holes=32, min_height=16, max_height=128,
                      min_width=16, max_width=128):
    # clamp hole extents to the image (the reference assumes 512px inputs)
    max_height = min(max_height, height)
    max_width = min(max_width, width)
    min_height = min(min_height, max_height)
    min_width = min(min_width, max_width)
    holes = []
    for _ in range(rng.randint(min_holes, max_holes)):
        hh = rng.randint(min_height, max_height)
        hw = rng.randint(min_width, max_width)
        y1 = rng.randint(0, height - hh)
        x1 = rng.randint(0, width - hw)
        holes.append((x1, y1, x1 + hw, y1 + hh))
    return holes


def generate_random_mask(image: np.ndarray, rng: random.Random):
    """image: (H, W, C) in [-1,1] -> (mask (H,W,1) in {0,1}, masked_image)."""
    h, w = image.shape[:2]
    mask = np.zeros((h, w, 1), np.float32)
    for (x1, y1, x2, y2) in _get_cutout_holes(h, w, rng):
        mask[y1:y2, x1:x2] = 1.0
    if rng.uniform(0, 1) < 0.25:
        mask.fill(1.0)
    masked = image * (mask < 0.5)
    return mask, masked


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

class PivotalTuningDataset:
    """Reference PivotalTuningDatasetCapation (dataset.py:119-311)."""

    def __init__(
        self,
        instance_data_root: str,
        tokenizer,
        token_map: Optional[dict] = None,
        use_template: Optional[str] = None,
        size: int = 512,
        h_flip: bool = True,
        color_jitter: bool = False,
        resize: bool = True,
        use_mask_captioned_data: bool = False,
        use_face_segmentation_condition: bool = False,
        train_inpainting: bool = False,
        blur_amount: int = 70,
        seed: int = 0,
    ):
        self.size = size
        self.tokenizer = tokenizer
        self.resize = resize
        self.train_inpainting = train_inpainting
        self.rng = random.Random(seed)

        root = Path(instance_data_root)
        if not root.exists():
            raise ValueError("Instance images root doesn't exists.")
        assert not (use_mask_captioned_data and use_template), \
            "Can't use both mask caption data and template."

        self.instance_images_path: List[str] = []
        self.mask_path: List[str] = []

        if use_mask_captioned_data:
            for f in sorted(glob.glob(str(root) + "/*src.jpg")):
                idx = int(Path(f).stem.split(".")[0])
                mpath = f"{root}/{idx}.mask.png"
                if Path(mpath).exists():
                    self.instance_images_path.append(f)
                    self.mask_path.append(mpath)
            with open(f"{root}/caption.txt") as fh:
                self.captions = fh.readlines()
        else:
            candidates = set(
                glob.glob(str(root) + "/*.jpg")
                + glob.glob(str(root) + "/*.png")
                + glob.glob(str(root) + "/*.jpeg")
            ) - set(glob.glob(str(root) + "/*mask.png"))
            self.instance_images_path = sorted(candidates)
            self.captions = [Path(x).name.split(".")[0]
                             for x in self.instance_images_path]

        assert self.instance_images_path, \
            "No images found in the instance data root."

        self.use_mask = use_face_segmentation_condition or use_mask_captioned_data
        if use_face_segmentation_condition:
            missing = [i for i in range(len(self.instance_images_path))
                       if not Path(f"{root}/{i}.mask.png").exists()]
            if missing:
                from .preprocess import face_mask_google_mediapipe

                masks = face_mask_google_mediapipe(
                    [Image.open(f).convert("RGB")
                     for f in self.instance_images_path],
                    blur_amount=blur_amount)
                for i, m in enumerate(masks):
                    m.save(f"{root}/{i}.mask.png")
            self.mask_path = [f"{root}/{i}.mask.png"
                              for i in range(len(self.instance_images_path))]

        self.num_instance_images = len(self.instance_images_path)
        self.token_map = token_map
        self.use_template = use_template
        self.templates = TEMPLATE_MAP[use_template] if use_template else None
        self.h_flip = h_flip
        self.color_jitter = color_jitter
        self.blur_amount = blur_amount
        self._length = self.num_instance_images

    def __len__(self):
        return self._length

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        example: Dict[str, np.ndarray] = {}
        i = index % self.num_instance_images
        img = load_image_norm(self.instance_images_path[i], self.size,
                              self.resize, self.color_jitter, self.rng)
        example["instance_images"] = img

        if self.train_inpainting:
            m, masked = generate_random_mask(img, self.rng)
            example["instance_masks"] = m
            example["instance_masked_images"] = masked

        if self.use_template:
            assert self.token_map is not None
            input_tok = list(self.token_map.values())[0]
            text = self.rng.choice(self.templates).format(input_tok)
        else:
            text = self.captions[i].strip()
            if self.token_map is not None:
                for token, value in self.token_map.items():
                    text = text.replace(token, value)

        if self.use_mask:
            # same transform chain as the image, then *0.5 + 1.0
            example["mask"] = load_image_norm(
                self.mask_path[i], self.size, self.resize) * 0.5 + 1.0
            if example["mask"].shape[-1] > 1:
                example["mask"] = example["mask"][..., :1]

        if self.h_flip and self.rng.random() > 0.5:
            example["instance_images"] = example["instance_images"][:, ::-1]
            if self.use_mask:
                example["mask"] = example["mask"][:, ::-1]
            if self.train_inpainting:
                example["instance_masks"] = example["instance_masks"][:, ::-1]
                example["instance_masked_images"] = \
                    example["instance_masked_images"][:, ::-1]

        example["text"] = text
        example["instance_prompt_ids"] = self.tokenizer(
            [text])["input_ids"][0]
        return example


class DreamBoothDataset:
    """Instance + class (prior-preservation) dataset
    (train_lora_dreambooth.py:51-147)."""

    def __init__(
        self,
        instance_data_root: str,
        instance_prompt: str,
        tokenizer,
        class_data_root: Optional[str] = None,
        class_prompt: Optional[str] = None,
        size: int = 512,
        center_crop: bool = False,
        color_jitter: bool = False,
        h_flip: bool = False,
        resize: bool = True,
        seed: int = 0,
        return_geometry: bool = False,
    ):
        self.size = size
        self.tokenizer = tokenizer
        self.rng = random.Random(seed)
        self.resize = resize
        self.color_jitter = color_jitter
        self.h_flip = h_flip
        # emit per-image [orig_h, orig_w, crop_top, crop_left] rows for
        # SDXL's text_time micro-conditioning (upstream XL trainers feed
        # true per-sample geometry, not the training resolution)
        self.return_geometry = return_geometry

        root = Path(instance_data_root)
        if not root.exists():
            raise ValueError("Instance images root doesn't exists.")
        # exclude cached face-seg masks ({i}.mask.png, written next to the
        # images by the PTI dataset) — they are 1-channel conditioning
        # files, not instances
        self.instance_images_path = sorted(
            str(p) for p in root.iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png")
            and not p.name.endswith(".mask.png"))
        self.num_instance_images = len(self.instance_images_path)
        self.instance_prompt = instance_prompt
        self._length = self.num_instance_images

        if class_data_root is not None:
            croot = Path(class_data_root)
            croot.mkdir(parents=True, exist_ok=True)
            self.class_images_path = sorted(
                str(p) for p in croot.iterdir()
                if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
            self.num_class_images = len(self.class_images_path)
            self._length = max(self.num_class_images, self.num_instance_images)
            self.class_prompt = class_prompt
        else:
            self.class_images_path = []
            self.num_class_images = 0

    def __len__(self):
        return self._length

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        ex: Dict[str, np.ndarray] = {}
        ipath = self.instance_images_path[index % self.num_instance_images]
        img = load_image_norm(ipath, self.size, self.resize,
                              self.color_jitter, self.rng)
        if self.h_flip and self.rng.random() > 0.5:
            img = img[:, ::-1]
        ex["instance_images"] = img
        if self.return_geometry:
            with Image.open(ipath) as im:  # header-only read
                ow, oh = im.size
            ex["instance_geometry"] = crop_geometry(
                ow, oh, self.size, self.resize)
        ex["instance_prompt_ids"] = self.tokenizer(
            [self.instance_prompt])["input_ids"][0]
        if self.num_class_images:
            cpath = self.class_images_path[index % self.num_class_images]
            cimg = load_image_norm(cpath, self.size, self.resize)
            ex["class_images"] = cimg
            if self.return_geometry:
                with Image.open(cpath) as im:
                    ow, oh = im.size
                ex["class_geometry"] = crop_geometry(
                    ow, oh, self.size, self.resize)
            ex["class_prompt_ids"] = self.tokenizer(
                [self.class_prompt])["input_ids"][0]
        return ex


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch: overlaps host-side image decode/augment
    with device steps (the async input pipeline the reference gets from
    torch DataLoader workers).

    The worker exits when the consumer abandons the generator (close/GC),
    not only at iterator exhaustion: training loops run ENDLESS loaders,
    and without the stop signal every finished run would leak a worker
    blocked in q.put holding the dataset — and still decoding concurrently
    with whatever runs next until the queue fills."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    stop_evt = threading.Event()

    def guarded_put(item) -> bool:
        while not stop_evt.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not guarded_put(item):
                    return
        except Exception as e:  # surface errors to the consumer
            guarded_put(("__error__", e))
        guarded_put(stop)

    t = threading.Thread(target=worker, daemon=True,
                         name="lora_tpu_prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            if (isinstance(item, tuple) and len(item) == 2
                    and item[0] == "__error__"):
                raise item[1]
            yield item
    finally:
        stop_evt.set()


def device_prefetch(iterator: Iterator, depth: int = 2,
                    sharding=None) -> Iterator:
    """Device-side prefetch: eagerly `jax.device_put` the next `depth`
    batches so host->device transfer overlaps the running step (transfers
    are async; the step executes while the next batch uploads). Combine with
    `prefetch` for host-side decode overlap:
    `device_prefetch(prefetch(data_loader(...)))`."""
    import collections

    import jax

    if sharding is not None:
        # multihost-safe placement (process-local rows -> global array)
        from ..parallel.mesh import put_batch_array

        def put(batch):
            return {k: put_batch_array(v, sharding)
                    for k, v in batch.items()}
    else:
        def put(batch):
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class DreamBoothTiDataset(DreamBoothDataset):
    """Legacy TI+LoRA dataset (train_lora_w_ti.py DreamBoothTiDataset):
    templated captions around the placeholder token with stochastic
    attribute augmentation — a random subset of `stochastic_attribute`,
    shuffled, comma-joined after the token (train_lora_w_ti.py:222-227)."""

    def __init__(self, *args, placeholder_token: str = "<s>",
                 learnable_property: str = "object",
                 stochastic_attribute: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.placeholder_token = placeholder_token
        self.templates = TEMPLATE_MAP[learnable_property]
        self.stochastic_attribute = (
            stochastic_attribute.split(",") if stochastic_attribute else [])

    def __getitem__(self, index):
        ex = super().__getitem__(index)
        attrs = [a for a in self.stochastic_attribute
                 if self.rng.random() < 0.5]
        self.rng.shuffle(attrs)
        text = self.rng.choice(self.templates).format(
            ", ".join([self.placeholder_token] + attrs))
        ex["instance_prompt_ids"] = self.tokenizer([text])["input_ids"][0]
        return ex


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def data_loader(dataset, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_last: bool = True,
                prior_preservation: bool = False,
                process_index: int = 0,
                process_count: int = 1,
                num_workers: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Endless batch iterator. With prior_preservation, instance and class
    halves are concatenated [instance | class] (the reference collate,
    train_lora_dreambooth.py:693-726). process_index/count shard the sample
    stream per host for multi-host training — the DistributedSampler
    replacement (SURVEY §5). num_workers > 0 decodes samples on a thread
    pool with one batch of lookahead (the torch DataLoader-workers
    equivalent, train_lora_dreambooth.py:725; the native imgops path
    releases the GIL, so threads decode truly in parallel). Augmentation
    RNG draws then interleave across threads — set num_workers=0 for
    bit-deterministic augmentation order."""

    def index_chunks():
        rng = random.Random(seed)
        n = len(dataset)
        while True:
            idxs = list(range(n))
            if shuffle:
                rng.shuffle(idxs)
            if process_count > 1:
                idxs = idxs[process_index::process_count] or idxs[:1]
            while len(idxs) < batch_size:  # tiny datasets: repeat-sample
                idxs = idxs + idxs
            m = len(idxs)
            for s in range(0, m - (batch_size - 1 if drop_last else 0),
                           batch_size):
                ci = idxs[s : s + batch_size]
                if len(ci) == batch_size or not drop_last:
                    yield ci

    def collate(chunk) -> Dict[str, np.ndarray]:
        batch: Dict[str, np.ndarray] = {}
        pixel = np.stack([c["instance_images"] for c in chunk])
        ids = [c["instance_prompt_ids"] for c in chunk]
        if prior_preservation:
            pixel = np.concatenate(
                [pixel, np.stack([c["class_images"] for c in chunk])])
            ids = ids + [c["class_prompt_ids"] for c in chunk]
            # explicit row-layout mask: under multi-process the global batch
            # is assembled from per-process [inst | class] blocks, so the
            # loss cannot rely on a positional midpoint split (loss.py)
            n = len(chunk)
            batch["is_instance"] = np.concatenate(
                [np.ones(n, np.float32), np.zeros(n, np.float32)])
        batch["pixel_values"] = pixel.astype(np.float32)
        batch["input_ids"] = np.asarray(ids, np.int64)
        if "instance_geometry" in chunk[0]:
            geom = np.stack([c["instance_geometry"] for c in chunk])
            if prior_preservation:
                geom = np.concatenate(
                    [geom, np.stack([c["class_geometry"] for c in chunk])])
            batch["time_ids_geom"] = geom.astype(np.float32)
        if "mask" in chunk[0]:
            batch["mask"] = np.stack(
                [c["mask"] for c in chunk]).astype(np.float32)
            if prior_preservation:
                batch["mask"] = np.concatenate(
                    [batch["mask"], np.ones_like(batch["mask"])])
        if "instance_masks" in chunk[0]:
            batch["mask_values"] = np.stack(
                [c["instance_masks"] for c in chunk]).astype(np.float32)
            batch["masked_image_values"] = np.stack(
                [c["instance_masked_images"] for c in chunk]
            ).astype(np.float32)
        return batch

    if num_workers <= 0:
        for ci in index_chunks():
            yield collate([dataset[i] for i in ci])
        return

    import collections
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=num_workers,
                              thread_name_prefix="lora_tpu_decode")
    pending: "collections.deque" = collections.deque()
    try:
        for ci in index_chunks():
            pending.append([pool.submit(dataset.__getitem__, i) for i in ci])
            if len(pending) >= 2:  # one batch of lookahead stays in flight
                yield collate([f.result() for f in pending.popleft()])
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
