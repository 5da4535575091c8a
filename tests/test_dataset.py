"""Data layer: captions, token maps, masks, templates, loaders."""

import numpy as np
import pytest
from PIL import Image

from lora_tpu.data.dataset import (
    DreamBoothTiDataset,
    OBJECT_TEMPLATE,
    PivotalTuningDataset,
    STYLE_TEMPLATE,
    data_loader,
    generate_random_mask,
    load_image_norm,
)
from lora_tpu.data.tokenizer import CLIPTokenizer


@pytest.fixture()
def tok():
    return CLIPTokenizer(vocab_size=1000)


def make_images(d, names):
    rs = np.random.RandomState(0)
    for n in names:
        Image.fromarray((rs.rand(80, 80, 3) * 255).astype(np.uint8)).save(
            d / n)


def test_filename_captions_and_token_map(tmp_path, tok):
    make_images(tmp_path, ["a red sks dog.jpg", "sks dog at beach.jpg"])
    ds = PivotalTuningDataset(str(tmp_path), tok,
                              token_map={"sks": "<s1><s2>"}, size=64, seed=0,
                              h_flip=False)
    texts = {ds[i]["text"] for i in range(4)}
    assert texts == {"a red <s1><s2> dog", "<s1><s2> dog at beach"}


def test_template_captions(tmp_path, tok):
    make_images(tmp_path, ["x.jpg"])
    ds = PivotalTuningDataset(str(tmp_path), tok,
                              token_map={"DUMMY": "<tok>"},
                              use_template="object", size=64, seed=3)
    for i in range(5):
        t = ds[i]["text"]
        assert "<tok>" in t
        assert any(t == tpl.format("<tok>") for tpl in OBJECT_TEMPLATE)


def test_mask_captioned_layout(tmp_path, tok):
    rs = np.random.RandomState(1)
    for i in range(2):
        Image.fromarray((rs.rand(80, 80, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"{i}.src.jpg")
        Image.fromarray((rs.rand(80, 80) * 255).astype(np.uint8), "L").save(
            tmp_path / f"{i}.mask.png")
    (tmp_path / "caption.txt").write_text("first caption\nsecond caption\n")
    ds = PivotalTuningDataset(str(tmp_path), tok, use_mask_captioned_data=True,
                              size=64, seed=0, h_flip=False)
    ex = ds[0]
    assert ex["text"] == "first caption"
    # mask transform: normalized then *0.5 + 1.0 -> range [0.5, 1.5]
    assert 0.45 <= ex["mask"].min() and ex["mask"].max() <= 1.55
    assert ex["mask"].shape == (64, 64, 1)


def test_inpainting_masks(tmp_path, tok):
    make_images(tmp_path, ["a.jpg"])
    ds = PivotalTuningDataset(str(tmp_path), tok, token_map={"DUMMY": "<t>"},
                              use_template="null", size=64,
                              train_inpainting=True, seed=0)
    ex = ds[0]
    m = ex["instance_masks"]
    assert set(np.unique(m)).issubset({0.0, 1.0})
    masked = ex["instance_masked_images"]
    # masked image must be zero where mask==1
    assert np.abs(masked[m[..., 0] > 0.5]).max() == 0.0


def test_random_mask_full_prob():
    import random

    rng = random.Random(0)
    fulls = 0
    for _ in range(200):
        m, _ = generate_random_mask(np.zeros((64, 64, 3), np.float32), rng)
        if m.min() == 1.0:
            fulls += 1
    assert 20 <= fulls <= 90  # ~25% full-mask rate (dataset.py:118)


def test_loader_prior_concat(tmp_path, tok):
    from lora_tpu.data.dataset import DreamBoothDataset

    inst = tmp_path / "inst"
    cls = tmp_path / "cls"
    inst.mkdir(), cls.mkdir()
    make_images(inst, ["i0.jpg", "i1.jpg"])
    make_images(cls, ["c0.jpg", "c1.jpg"])
    ds = DreamBoothDataset(str(inst), "a sks", tok, class_data_root=str(cls),
                           class_prompt="a thing", size=64)
    loader = data_loader(ds, 2, prior_preservation=True, seed=0)
    b = next(loader)
    assert b["pixel_values"].shape == (4, 64, 64, 3)  # [inst|class]
    assert b["input_ids"].shape[0] == 4


def test_loader_host_sharding(tmp_path, tok):
    from lora_tpu.data.dataset import DreamBoothDataset

    make_images(tmp_path, [f"{i}.jpg" for i in range(8)])
    ds = DreamBoothDataset(str(tmp_path), "p", tok, size=64)
    l0 = data_loader(ds, 2, seed=5, shuffle=False, process_index=0,
                     process_count=2)
    l1 = data_loader(ds, 2, seed=5, shuffle=False, process_index=1,
                     process_count=2)
    b0, b1 = next(l0), next(l1)
    # disjoint sample streams
    assert not np.allclose(b0["pixel_values"], b1["pixel_values"])


def test_ti_dataset_stochastic_attributes(tmp_path, tok):
    make_images(tmp_path, ["z.jpg"])
    ds = DreamBoothTiDataset(str(tmp_path), "", tok, size=64,
                             placeholder_token="<k>",
                             stochastic_attribute="red,small", seed=0)
    seen = set()
    for i in range(20):
        ids = tuple(ds[i]["instance_prompt_ids"])
        seen.add(ids)
    assert len(seen) > 3  # attribute/template randomization varies prompts


def test_loader_dataset_smaller_than_batch(tmp_path, tok):
    from lora_tpu.data.dataset import DreamBoothDataset

    make_images(tmp_path, ["only.jpg"])
    ds = DreamBoothDataset(str(tmp_path), "p", tok, size=64)
    loader = data_loader(ds, 4, seed=0)
    b = next(loader)  # must not hang; repeats the single sample
    assert b["pixel_values"].shape == (4, 64, 64, 3)


def test_prefetch_wrapper(tmp_path, tok):
    from lora_tpu.data.dataset import DreamBoothDataset, prefetch

    make_images(tmp_path, ["p0.jpg", "p1.jpg"])
    ds = DreamBoothDataset(str(tmp_path), "p", tok, size=64)
    it = prefetch(data_loader(ds, 2, seed=0), depth=2)
    b1, b2 = next(it), next(it)
    assert b1["pixel_values"].shape == (2, 64, 64, 3)
    assert b2["pixel_values"].shape == (2, 64, 64, 3)

    def boom():
        yield {"x": 1}
        raise RuntimeError("decode failed")

    it = prefetch(boom())
    next(it)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        next(it)


def test_load_image_norm_range(tmp_path):
    img = Image.fromarray(np.full((100, 50, 3), 255, np.uint8))
    arr = load_image_norm(img, 32)
    assert arr.shape == (32, 32, 3)
    np.testing.assert_allclose(arr, 1.0, atol=1e-6)


def test_device_prefetch_preserves_stream():
    import itertools

    import jax
    import numpy as np

    from lora_tpu.data.dataset import device_prefetch

    def gen():
        for i in range(5):
            yield {"x": np.full((2, 2), i, np.float32)}

    got = list(device_prefetch(gen(), depth=2))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))
    # endless iterators stay lazy
    lazy = device_prefetch(({"x": np.zeros(1)} for _ in itertools.count()))
    next(lazy); next(lazy)


def test_loader_worker_pool_matches_serial(tmp_path, tok):
    """num_workers>0 (thread-pool decode with lookahead) yields the same
    batches as the serial path for deterministic (no-augment) datasets."""
    from lora_tpu.data.dataset import DreamBoothDataset

    make_images(tmp_path, [f"{i}.jpg" for i in range(6)])
    mk = lambda: DreamBoothDataset(str(tmp_path), "a sks", tok, size=64)
    serial = data_loader(mk(), 2, seed=3, num_workers=0)
    pooled = data_loader(mk(), 2, seed=3, num_workers=3)
    for _ in range(7):  # crosses an epoch boundary (3 batches/epoch)
        bs, bp = next(serial), next(pooled)
        np.testing.assert_array_equal(bs["pixel_values"], bp["pixel_values"])
        np.testing.assert_array_equal(bs["input_ids"], bp["input_ids"])


def test_dreambooth_dataset_ignores_cached_masks(tmp_path, tok):
    """A face-conditioned PTI run caches {i}.mask.png next to the instance
    images; a later DreamBooth run on the same directory must not pick the
    1-channel masks up as instances (regression: they reached the VAE and
    failed its 3-channel stem conv)."""
    from PIL import Image

    from lora_tpu.data.dataset import DreamBoothDataset

    make_images(tmp_path, ["0.jpg", "1.jpg"])
    Image.new("L", (32, 32), 255).save(tmp_path / "0.mask.png")
    Image.new("L", (32, 32), 255).save(tmp_path / "1.mask.png")
    ds = DreamBoothDataset(str(tmp_path), "p", tok, size=64)
    assert ds.num_instance_images == 2
    assert all(not p.endswith(".mask.png") for p in ds.instance_images_path)
    assert ds[0]["instance_images"].shape == (64, 64, 3)


def test_crop_geometry_matches_transform(tmp_path, tok):
    """return_geometry emits [orig_h, orig_w, crop_top, crop_left] rows
    matching the deterministic resize-short + center-crop transform (the
    SDXL text_time micro-conditioning convention: crop offsets in
    post-resize pixel space)."""
    from lora_tpu.data.dataset import DreamBoothDataset, crop_geometry

    rs = np.random.RandomState(3)
    # landscape: short side = height -> resize to (h=48, w=80), crop left
    Image.fromarray((rs.rand(60, 100, 3) * 255).astype(np.uint8)).save(
        tmp_path / "0 wide.jpg")
    # portrait: short side = width -> resize to (h=80, w=48), crop top
    Image.fromarray((rs.rand(100, 60, 3) * 255).astype(np.uint8)).save(
        tmp_path / "1 tall.jpg")
    ds = DreamBoothDataset(str(tmp_path), "p", tok, size=48,
                           return_geometry=True)
    g0 = ds[0]["instance_geometry"]
    g1 = ds[1]["instance_geometry"]
    np.testing.assert_array_equal(g0, [60, 100, 0, (80 - 48) // 2])
    np.testing.assert_array_equal(g1, [100, 60, (80 - 48) // 2, 0])
    # the helper agrees with itself over the (w, h) PIL convention
    np.testing.assert_array_equal(
        crop_geometry(100, 60, 48), g0)
    # resize=False: crop offsets in the original frame
    np.testing.assert_array_equal(
        crop_geometry(100, 60, 48, resize=False), [60, 100, 6, 26])
    # no flag -> no key (non-XL trainers see the old example layout)
    ds_plain = DreamBoothDataset(str(tmp_path), "p", tok, size=48)
    assert "instance_geometry" not in ds_plain[0]


def test_loader_collates_geometry_with_prior(tmp_path, tok):
    """time_ids_geom rows follow the [instance | class] collate layout."""
    from lora_tpu.data.dataset import DreamBoothDataset

    inst = tmp_path / "inst"
    cls = tmp_path / "cls"
    inst.mkdir()
    cls.mkdir()
    rs = np.random.RandomState(5)
    Image.fromarray((rs.rand(60, 90, 3) * 255).astype(np.uint8)).save(
        inst / "a.jpg")
    Image.fromarray((rs.rand(90, 60, 3) * 255).astype(np.uint8)).save(
        cls / "b.jpg")
    ds = DreamBoothDataset(str(inst), "a sks", tok, class_data_root=str(cls),
                           class_prompt="a dog", size=48,
                           return_geometry=True)
    batch = next(data_loader(ds, 2, prior_preservation=True, seed=0))
    g = batch["time_ids_geom"]
    assert g.shape == (4, 4) and g.dtype == np.float32
    np.testing.assert_array_equal(g[0], g[1])  # both instance rows = a.jpg
    np.testing.assert_array_equal(g[0][:2], [60, 90])
    np.testing.assert_array_equal(g[2][:2], [90, 60])  # class rows = b.jpg


def test_prefetch_worker_stops_when_consumer_abandons():
    """Training loops run ENDLESS loaders through prefetch; abandoning the
    generator (what every finished training run does when it drops the
    loader) must stop the worker thread. Before the stop signal, each run
    leaked a worker blocked in q.put that kept decoding concurrently with
    whatever ran next until its queue filled."""
    import itertools
    import threading
    import time

    from lora_tpu.data.dataset import prefetch

    def workers():
        return [t for t in threading.enumerate()
                if t.name.startswith("lora_tpu_prefetch") and t.is_alive()]

    produced = []

    def endless():
        for i in itertools.count():
            produced.append(i)
            yield i

    it = prefetch(endless(), depth=2)
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    assert len(workers()) >= 1
    it.close()  # what GC does to an abandoned generator
    deadline = time.monotonic() + 5
    while workers() and time.monotonic() < deadline:
        time.sleep(0.05)
    assert not workers(), "prefetch worker thread leaked after close()"
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n, "worker kept consuming after close()"
