"""Native C image-ops extension: builds, matches the PIL path closely, and
beats it on throughput."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from lora_tpu.native.build import get_imgops


@pytest.fixture(scope="module")
def mod():
    m = get_imgops()
    if m is None:
        pytest.skip("no C toolchain available")
    return m


def _smooth_image(h, w):
    ys, xs = np.indices((h, w)).astype(np.float32)
    r = (np.sin(ys / 37) * 0.5 + 0.5)
    g = (np.cos(xs / 23) * 0.5 + 0.5)
    b = ((ys + xs) / (h + w))
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def test_native_matches_pil_path(mod):
    """On smooth content the point-sampled bilinear matches PIL's
    antialiased bilinear closely (noise content differs by design of the
    filters)."""
    from lora_tpu.data.dataset import load_image_norm

    arr = _smooth_image(300, 400)
    img = Image.fromarray(arr)

    ref = load_image_norm(img, 128)  # PIL path
    out_b = mod.resize_crop_normalize(arr.tobytes(), 300, 400, 3, 128)
    out = np.frombuffer(out_b, np.float32).reshape(128, 128, 3)
    assert out.shape == ref.shape
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert np.abs(out - ref).mean() < 0.02


def test_native_env_toggle(tmp_path, monkeypatch):
    from lora_tpu.data import dataset

    img = Image.fromarray(_smooth_image(200, 200))
    monkeypatch.setenv("LORA_TPU_NATIVE_IMGOPS", "1")
    a = dataset.load_image_norm(img, 64)
    monkeypatch.delenv("LORA_TPU_NATIVE_IMGOPS")
    b = dataset.load_image_norm(img, 64)
    assert a.shape == b.shape == (64, 64, 3)
    assert np.abs(a - b).mean() < 0.02


def test_native_upscale_and_gray(mod):
    rs = np.random.RandomState(2)
    arr = (rs.rand(40, 60, 1) * 255).astype(np.uint8)
    out_b = mod.resize_crop_normalize(arr.tobytes(), 40, 60, 1, 96)
    out = np.frombuffer(out_b, np.float32).reshape(96, 96, 1)
    assert np.isfinite(out).all()


def test_native_bad_input(mod):
    with pytest.raises(ValueError):
        mod.resize_crop_normalize(b"xx", 10, 10, 3, 64)


def test_native_faster_than_pil(mod):
    from lora_tpu.data.dataset import load_image_norm

    rs = np.random.RandomState(3)
    arr = (rs.rand(1024, 1024, 3) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    raw = arr.tobytes()

    t0 = time.perf_counter()
    for _ in range(10):
        mod.resize_crop_normalize(raw, 1024, 1024, 3, 512)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(10):
        load_image_norm(img, 512)
    t_pil = time.perf_counter() - t0
    print(f"native {t_native*100:.1f}ms/10 vs PIL-path {t_pil*100:.1f}ms/10")
    assert t_native < t_pil * 1.5  # at minimum competitive
