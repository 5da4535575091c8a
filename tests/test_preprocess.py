"""Preprocessing pipeline (lora_ppim): salience crop math and the
fallback-driven end-to-end dataset build."""

import os

import numpy as np
from PIL import Image

from lora_tpu.data.preprocess import (
    _center_of_mass,
    _crop_to_square,
    _ellipse_mask,
    load_and_save_masks_and_captions,
)


def test_center_of_mass():
    arr = np.zeros((100, 100), np.uint8)
    arr[10:20, 70:90] = 255
    cx, cy = _center_of_mass(Image.fromarray(arr, "L"))
    assert 75 <= cx <= 84 and 10 <= cy <= 19


def test_center_of_mass_empty_mask():
    cx, cy = _center_of_mass(Image.new("L", (60, 40), 0))
    assert (cx, cy) == (30, 20)


def test_crop_to_square_follows_com():
    img = Image.new("RGB", (200, 100))
    out = _crop_to_square(img, (180, 50), resize_to=64)
    assert out.size == (64, 64)
    # salience at the far right: crop window must be clamped to the edge
    out2 = _crop_to_square(img, (0, 50))
    assert out2.size == (100, 100)


def test_ellipse_mask_center_bright():
    m = np.asarray(_ellipse_mask((64, 64)))
    assert m[32, 32] > 150 and m[0, 0] < 50


def test_end_to_end_fallbacks(tmp_path):
    """No aux models available -> constant captions, ellipse masks, bicubic
    SR; output layout matches the reference ({i}.src.jpg / {i}.mask.png /
    caption.txt, preprocess_files.py:304-327)."""
    src = tmp_path / "raw"
    src.mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rs.rand(120, 90, 3) * 255).astype(np.uint8)).save(
            src / f"im{i}.jpg")
    out = str(tmp_path / "built")
    captions = load_and_save_masks_and_captions(
        str(src), out, target_size=64, use_face_detection_instead=True)
    assert len(captions) == 3
    for i in range(3):
        assert os.path.exists(os.path.join(out, f"{i}.src.jpg"))
        m = Image.open(os.path.join(out, f"{i}.mask.png"))
        assert m.size == (64, 64)
        s = Image.open(os.path.join(out, f"{i}.src.jpg"))
        assert s.size == (64, 64)
    assert len(open(os.path.join(out, "caption.txt")).read().splitlines()) == 3

    # and the built dataset loads through the mask-captioned dataset path
    from lora_tpu.data.dataset import PivotalTuningDataset
    from lora_tpu.data.tokenizer import CLIPTokenizer

    ds = PivotalTuningDataset(out, CLIPTokenizer(vocab_size=1000),
                              use_mask_captioned_data=True, size=64, seed=0)
    ex = ds[0]
    assert "mask" in ex and ex["instance_images"].shape == (64, 64, 3)
