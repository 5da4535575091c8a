"""Format layer: golden-file parity with the reference safetensors schema."""

import json

import numpy as np
import pytest

from lora_tpu.formats import reader
from lora_tpu.formats.safetensors_io import (
    EMBED_FLAG,
    load_safeloras_both,
    parse_safeloras,
    parse_safeloras_embeds,
    pairs_from_flat,
    save_safeloras_with_embeds,
)


def test_reader_matches_safetensors_package(golden_disney):
    st = pytest.importorskip("safetensors")
    from safetensors import safe_open as hf_safe_open

    ours = reader.SafetensorsFile(golden_disney)
    theirs = hf_safe_open(golden_disney, framework="np")
    assert sorted(ours.keys()) == sorted(theirs.keys())
    assert ours.metadata() == theirs.metadata()
    for k in list(ours.keys())[:16] + ["<s1>", "<s2>"]:
        np.testing.assert_array_equal(ours.get_tensor(k), theirs.get_tensor(k))
    ours.close()


def test_parse_golden_disney(golden_disney):
    loras, embeds = load_safeloras_both(golden_disney)
    assert set(loras) == {"unet", "text_encoder"}
    w_unet, r_unet, tgt_unet = loras["unet"]
    assert len(w_unet) == 288 and r_unet == [1] * 144
    assert set(tgt_unet) == {"CrossAttention", "Attention", "GEGLU"}
    w_te, r_te, tgt_te = loras["text_encoder"]
    assert len(w_te) == 96 and r_te == [1] * 48
    assert set(tgt_te) == {"CLIPAttention"}
    assert set(embeds) == {"<s1>", "<s2>"}
    assert embeds["<s1>"].shape == (768,)
    # flat ordering: [up0, down0, up1, down1, ...]
    assert w_unet[0].shape == (320, 1) and w_unet[1].shape == (1, 320)


def test_parse_golden_svd(golden_svd):
    loras, embeds = load_safeloras_both(golden_svd)
    assert embeds == {}
    w, ranks, _ = loras["unet"]
    assert len(w) == 288 and ranks == [4] * 144
    assert loras["text_encoder"][1] == [4] * 48


def test_roundtrip_bitexact(golden_disney, tmp_path):
    """Write with our writer, reread: tensors byte-identical, metadata equal."""
    loras, embeds = load_safeloras_both(golden_disney)
    modelmap = {
        name: (pairs_from_flat(w), tgt) for name, (w, ranks, tgt) in loras.items()
    }
    out = str(tmp_path / "rt.safetensors")
    save_safeloras_with_embeds(modelmap, embeds, out)

    orig = reader.SafetensorsFile(golden_disney)
    ours = reader.SafetensorsFile(out)
    assert sorted(orig.keys()) == sorted(ours.keys())
    for k in orig.keys():
        np.testing.assert_array_equal(orig.get_tensor(k), ours.get_tensor(k))
        assert orig.dtype(k) == ours.dtype(k)
    m0, m1 = orig.metadata(), ours.metadata()
    assert set(m0) == set(m1)
    for k in m0:
        if m0[k].startswith("["):  # target set: order-insensitive json list
            assert set(json.loads(m0[k])) == set(json.loads(m1[k]))
        else:
            assert m0[k] == m1[k]
    # and the safetensors package can read our output too
    from safetensors import safe_open as hf_safe_open

    h = hf_safe_open(out, framework="np")
    assert sorted(h.keys()) == sorted(orig.keys())
    orig.close()
    ours.close()


def test_writer_bf16_roundtrip(tmp_path):
    import jax.numpy as jnp

    x = np.linspace(-3, 3, 64, dtype=np.float32).reshape(8, 8)
    xb = jnp.asarray(x, jnp.bfloat16)
    p = str(tmp_path / "bf16.safetensors")
    reader.save_file({"x": np.asarray(xb)}, p, {"note": "bf16"})
    f = reader.SafetensorsFile(p)
    assert f.dtype("x") == "BF16"
    got = f.get_tensor("x")  # widened to f32
    np.testing.assert_array_equal(got, np.asarray(xb, np.float32))
    f.close()


def test_embed_flag_separation(tmp_path):
    pairs = [(np.ones((8, 2), np.float32), np.ones((2, 4), np.float32))]
    emb = {"<tok>": np.arange(8, dtype=np.float32)}
    out = str(tmp_path / "mix.safetensors")
    save_safeloras_with_embeds({"unet": (pairs, {"CrossAttention"})}, emb, out,
                               cast_fp16=True)
    with reader.SafetensorsFile(out) as f:
        assert f.dtype("unet:0:up") == "F16"  # fresh saves are fp16
        assert f.dtype("<tok>") == "F32"
    with reader.SafetensorsFile(out) as f:
        assert f.metadata()["<tok>"] == EMBED_FLAG
        loras = parse_safeloras(f)
        embeds = parse_safeloras_embeds(f)
    assert list(loras) == ["unet"] and loras["unet"][1] == [2]
    np.testing.assert_array_equal(embeds["<tok>"], emb["<tok>"])


def test_save_lora_json_roundtrip(tmp_path):
    from lora_tpu.formats.pt_io import load_lora_json, save_lora_json

    pairs = [(np.ones((4, 2), np.float32) * 0.5,
              np.arange(6, dtype=np.float32).reshape(2, 3))]
    p = str(tmp_path / "lora.json")
    save_lora_json(pairs, p)
    flat = load_lora_json(p)
    assert len(flat) == 2
    np.testing.assert_array_equal(flat[0], pairs[0][0])
    np.testing.assert_array_equal(flat[1], pairs[0][1])
