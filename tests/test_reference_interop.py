"""Differential tests that EXECUTE the reference implementation live.

Everything else in the suite pins interop through frozen golden artifacts
or this repo's own re-derivations (torch oracle, HF CLIP). These tests
close the remaining gap: `/root/reference/lora_diffusion/lora.py` (the
1,110-LoC core: inject/save/parse/collapse/monkeypatch) and
`to_ckpt_v2.py` (CompVis key maps) import and run standalone in this
environment (torch + safetensors; no diffusers needed), so the reference's
binary behavior is used directly as the oracle:

  - reference inject + save_safeloras -> repo parse        (lora.py:255-535)
  - repo save_safeloras_with_embeds -> reference parse +
    monkeypatch_or_replace_lora[_extended]                 (lora.py:538-809)
  - collapse / monkeypatch_add_lora / tune_lora_scale /
    set_lora_diag numerics vs the repo combinators         (lora.py:635-886)
  - reference .pt flat list <-> repo pt_io                 (lora.py:424-436)
  - to_ckpt_v2 UNet/VAE key maps vs ckpt_export            (to_ckpt_v2.py:91-197)

The toy torch modules use the reference target-set CLASS NAMES
(CrossAttention/GEGLU/ResnetBlock2D) because the reference matches
ancestors by __class__.__name__ (lora.py:172-252).
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lora_tpu.core.lora import (  # noqa: E402
    add_lora,
    collapse_lora,
    lora_delta_conv,
    lora_delta_dense,
)
from lora_tpu.formats.safetensors_io import (  # noqa: E402
    load_safeloras_both,
    save_safeloras_with_embeds,
)

REF_DIR = "/root/reference/lora_diffusion"


def _load(name, filename):
    spec = importlib.util.spec_from_file_location(name, f"{REF_DIR}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load("_ref_lora", "lora.py")


@pytest.fixture(scope="module")
def ref_ckpt():
    return _load("_ref_to_ckpt_v2", "to_ckpt_v2.py")


# ---------------------------------------------------------------------------
# toy torch modules carrying the reference target-set class names
# ---------------------------------------------------------------------------

DIM, CTX = 16, 8
TARGETS = {"CrossAttention", "GEGLU"}
TARGETS_EXT = {"CrossAttention", "GEGLU", "ResnetBlock2D"}


class CrossAttention(nn.Module):
    def __init__(self):
        super().__init__()
        self.to_q = nn.Linear(DIM, DIM, bias=False)
        self.to_k = nn.Linear(CTX, DIM, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(DIM, DIM)])


class GEGLU(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Linear(DIM, 2 * DIM)


class ResnetBlock2D(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(4, 6, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(4, 6, 1)


class ToyUNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.blk0 = CrossAttention()
        self.res = ResnetBlock2D()
        self.mid = nn.Sequential(GEGLU())
        self.plain = nn.Linear(DIM, DIM)  # outside every target set


def _randomize_ups(ref, model, targets, seed=0, std=0.2):
    """Reference up weights init to zero; give them values so deltas exist."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for up, _down in ref.extract_lora_ups_down(model, targets):
            up.weight.copy_(torch.randn(up.weight.shape, generator=g) * std)


def _injected_linears(ref, model, targets):
    return [c for _m, _n, c in ref._find_modules(
        model, targets, search_class=[ref.LoraInjectedLinear])]


# ---------------------------------------------------------------------------
# (a) reference save -> repo parse
# ---------------------------------------------------------------------------

def test_ref_save_repo_parse_forward_delta(ref, tmp_path):
    """Reference inject_trainable_lora + save_safeloras; the repo parser
    must recover (up, down) in the reference's traversal order, and the
    repo's functional delta must equal the live reference module's."""
    torch.manual_seed(0)
    model = ToyUNet()
    ref.inject_trainable_lora(model, TARGETS, r=3)
    _randomize_ups(ref, model, TARGETS, seed=1)

    path = str(tmp_path / "ref_saved.safetensors")
    ref.save_safeloras({"unet": (model, TARGETS)}, path)

    loras, embeds = load_safeloras_both(path)
    assert embeds == {}
    weights, ranks, target = loras["unet"]
    assert set(target) == TARGETS

    mods = _injected_linears(ref, model, TARGETS)
    assert len(mods) == len(ranks) == len(weights) // 2
    assert all(r == 3 for r in ranks)

    for i, child in enumerate(mods):
        up, down = weights[2 * i], weights[2 * i + 1]
        # file is fp16 (reference extract_lora_as_tensor default)
        np.testing.assert_array_equal(
            up, child.lora_up.weight.detach().half().float().numpy())
        x = torch.randn(5, child.linear.in_features)
        want = (child(x) - child.linear(x)).detach().numpy()
        got = lora_delta_dense(jnp.asarray(x.numpy()),
                               {"up": jnp.asarray(up),
                                "down": jnp.asarray(down)},
                               jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-3, atol=2e-3)


def test_ref_pt_flat_list_interop(ref, tmp_path):
    """save_lora_weight's flat [up0, down0, ...] .pt (lora.py:424-436)
    loads through repo pt_io, and a repo-written .pt loads back through
    reference inject_trainable_lora(loras=path)."""
    from lora_tpu.formats.pt_io import load_lora_pt, save_lora_pt

    torch.manual_seed(2)
    model = ToyUNet()
    ref.inject_trainable_lora(model, TARGETS, r=2)
    _randomize_ups(ref, model, TARGETS, seed=3)
    p = str(tmp_path / "ref.pt")
    ref.save_lora_weight(model, p, TARGETS)

    flat = load_lora_pt(p)
    mods = _injected_linears(ref, model, TARGETS)
    assert len(flat) == 2 * len(mods)
    for i, child in enumerate(mods):
        np.testing.assert_array_equal(
            flat[2 * i], child.lora_up.weight.detach().half().float().numpy())

    # repo .pt -> reference load (inject pops the flat list in order).
    # Repo files store nn.Parameter elements because the reference's raw
    # `lora_up.weight = loras.pop(0)` assignment (lora.py:301-303) rejects
    # plain tensors — see save_lora_pt's docstring.
    pairs = [(np.asarray(flat[2 * i]), np.asarray(flat[2 * i + 1]))
             for i in range(len(mods))]
    p2 = str(tmp_path / "repo.pt")
    save_lora_pt(pairs, p2)
    model2 = ToyUNet()
    torch.manual_seed(2)  # irrelevant for comparison below; ups are loaded
    ref.inject_trainable_lora(model2, TARGETS, r=2, loras=p2)
    for child, (up, down) in zip(_injected_linears(ref, model2, TARGETS),
                                 pairs):
        np.testing.assert_allclose(
            child.lora_up.weight.detach().float().numpy(), up,
            rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# (b) repo save -> reference parse + monkeypatch
# ---------------------------------------------------------------------------

def _ref_order_shapes(ref, model, targets, search):
    return [(c.out_features, c.in_features) if isinstance(c, nn.Linear)
            else c.weight.shape for _m, _n, c in
            ref._find_modules(model, targets, search_class=search)]


def test_repo_save_ref_monkeypatch(ref, tmp_path):
    """Repo-authored safetensors drives the reference loader end to end:
    parse_safeloras + monkeypatch_or_replace_lora + tune_lora_scale, and
    the live reference forward delta matches the repo functional delta.
    TI embeds round-trip through reference parse_safeloras_embeds."""
    rng = np.random.default_rng(0)
    model = ToyUNet()
    shapes = _ref_order_shapes(ref, model, TARGETS, [nn.Linear])
    r = 3
    pairs = [(rng.normal(0, 0.2, (o, r)).astype(np.float32),
              rng.normal(0, 0.2, (r, i)).astype(np.float32))
             for o, i in shapes]
    ti = {"<s1>": rng.normal(0, 0.02, (CTX,)).astype(np.float32),
          "<s2>": rng.normal(0, 0.02, (CTX,)).astype(np.float32)}

    path = str(tmp_path / "repo_saved.safetensors")
    save_safeloras_with_embeds({"unet": (pairs, TARGETS)}, ti, path,
                               cast_fp16=False)

    loras = ref.load_safeloras(path)
    weights, ranks, target = loras["unet"]
    assert ranks == [r] * len(pairs) and set(target) == TARGETS
    ref.monkeypatch_or_replace_lora(model, weights, set(target), ranks)
    ref.tune_lora_scale(model, 0.65)
    model.eval()  # monkeypatch re-creates modules with dropout_p=0.1

    for child, (up, down) in zip(_injected_linears(ref, model, TARGETS),
                                 pairs):
        x = torch.randn(4, down.shape[1])
        want = (child(x) - child.linear(x)).detach().numpy()
        got = lora_delta_dense(jnp.asarray(x.numpy()),
                               {"up": jnp.asarray(up),
                                "down": jnp.asarray(down)},
                               jnp.float32(0.65))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    embeds = ref.load_safeloras_embeds(path)
    assert set(embeds) == {"<s1>", "<s2>"}
    for t in ti:
        np.testing.assert_array_equal(embeds[t].numpy(), ti[t])


def test_repo_save_ref_monkeypatch_extended_conv(ref, tmp_path):
    """Extended (conv) sites through reference
    monkeypatch_or_replace_lora_extended: repo conv pair layout
    (down (r,in,kh,kw), up (out,r,1,1)) is the reference's
    LoraInjectedConv2d layout, and deltas agree with lora_delta_conv."""
    rng = np.random.default_rng(1)
    model = ToyUNet()
    r = 2
    pairs = []
    for _m, _n, c in ref._find_modules(model, TARGETS_EXT,
                                       search_class=[nn.Linear, nn.Conv2d]):
        if isinstance(c, nn.Linear):
            pairs.append(
                (rng.normal(0, 0.2, (c.out_features, r)).astype(np.float32),
                 rng.normal(0, 0.2, (r, c.in_features)).astype(np.float32)))
        else:
            o, i, kh, kw = c.weight.shape
            pairs.append(
                (rng.normal(0, 0.2, (o, r, 1, 1)).astype(np.float32),
                 rng.normal(0, 0.2, (r, i, kh, kw)).astype(np.float32)))

    path = str(tmp_path / "repo_ext.safetensors")
    save_safeloras_with_embeds({"unet": (pairs, TARGETS_EXT)}, {}, path,
                               cast_fp16=False)
    weights, ranks, target = ref.load_safeloras(path)["unet"]
    ref.monkeypatch_or_replace_lora_extended(model, weights, set(target),
                                             ranks)
    model.eval()  # monkeypatch re-creates modules with dropout_p=0.1

    convs = [c for _m, _n, c in ref._find_modules(
        model, TARGETS_EXT, search_class=[ref.LoraInjectedConv2d])]
    conv_pairs = [p for p in pairs if p[0].ndim == 4]
    assert len(convs) == len(conv_pairs) == 2
    for child, (up, down) in zip(convs, conv_pairs):
        x = torch.randn(2, down.shape[1], 5, 5)
        want = (child(x) - child.conv(x)).detach().numpy()  # NCHW
        got = lora_delta_conv(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),  # NHWC
            {"up": jnp.asarray(up), "down": jnp.asarray(down)},
            jnp.float32(1.0),
            stride=child.conv.stride, padding=child.conv.padding)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want,
            rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# (c) combinator numerics vs the live reference
# ---------------------------------------------------------------------------

def _tree_from_model(ref, model, targets):
    """Snapshot a reference-injected model as a repo LoraTree + base params
    keyed by synthetic names in reference traversal order."""
    sites, params = {}, {}
    for i, child in enumerate(_injected_linears(ref, model, targets)):
        name = f"site{i}"
        sites[name] = {
            "up": jnp.asarray(child.lora_up.weight.detach().numpy()),
            "down": jnp.asarray(child.lora_down.weight.detach().numpy()),
        }
        params[name + ".weight"] = jnp.asarray(
            child.linear.weight.detach().numpy())
    return {"sites": sites, "scale": jnp.float32(1.0)}, params


def test_collapse_matches_reference(ref):
    torch.manual_seed(4)
    model = ToyUNet()
    ref.inject_trainable_lora(model, TARGETS, r=3)
    _randomize_ups(ref, model, TARGETS, seed=5)
    tree, params = _tree_from_model(ref, model, TARGETS)

    got = collapse_lora(params, tree, alpha=0.6)
    ref.collapse_lora(model, alpha=0.6)
    for i, child in enumerate(_injected_linears(ref, model, TARGETS)):
        np.testing.assert_allclose(
            np.asarray(got[f"site{i}.weight"]),
            child.linear.weight.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_monkeypatch_add_matches_add_lora(ref):
    """Reference monkeypatch_add_lora: up <- alpha*new + beta*old
    (lora.py:850-874) == repo add_lora(alpha, beta)."""
    torch.manual_seed(6)
    model = ToyUNet()
    ref.inject_trainable_lora(model, TARGETS, r=2)
    _randomize_ups(ref, model, TARGETS, seed=7)
    tree_a, _ = _tree_from_model(ref, model, TARGETS)

    rng = np.random.default_rng(8)
    flat_b, sites_b = [], {}
    for i, child in enumerate(_injected_linears(ref, model, TARGETS)):
        up = rng.normal(0, 0.2, child.lora_up.weight.shape).astype(np.float32)
        down = rng.normal(0, 0.2,
                          child.lora_down.weight.shape).astype(np.float32)
        flat_b += [torch.from_numpy(up), torch.from_numpy(down)]
        sites_b[f"site{i}"] = {"up": jnp.asarray(up),
                               "down": jnp.asarray(down)}
    tree_b = {"sites": sites_b, "scale": jnp.float32(1.0)}

    got = add_lora(tree_a, tree_b, alpha=0.3, beta=0.8)
    ref.monkeypatch_add_lora(model, flat_b, TARGETS, alpha=0.3, beta=0.8)
    for i, child in enumerate(_injected_linears(ref, model, TARGETS)):
        np.testing.assert_allclose(
            np.asarray(got["sites"][f"site{i}"]["up"]),
            child.lora_up.weight.detach().numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got["sites"][f"site{i}"]["down"]),
            child.lora_down.weight.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_scale_and_diag_match_reference(ref):
    """tune_lora_scale + set_lora_diag forward numerics (lora.py:63-70,
    877-886) vs the repo's traced scale and per-site diag selector."""
    torch.manual_seed(9)
    model = ToyUNet()
    ref.inject_trainable_lora(model, TARGETS, r=4)
    _randomize_ups(ref, model, TARGETS, seed=10)
    tree, _ = _tree_from_model(ref, model, TARGETS)

    diag = [1.0, 0.0, 0.7, 0.0]
    ref.set_lora_diag(model, torch.tensor(diag))
    ref.tune_lora_scale(model, 0.4)
    for i, child in enumerate(_injected_linears(ref, model, TARGETS)):
        x = torch.randn(3, child.linear.in_features)
        want = (child(x) - child.linear(x)).detach().numpy()
        entry = {**tree["sites"][f"site{i}"], "diag": jnp.asarray(diag)}
        got = lora_delta_dense(jnp.asarray(x.numpy()), entry,
                               jnp.float32(0.4))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)


def test_lora_join_matches_reference(ref, tmp_path):
    """Multi-LoRA join: repo lora_join vs the reference's lora_join
    (lora_manager.py:13-72) on the same two repo-authored files — identical
    tensor keys/values (rank-concat on the right axes), rank metadata,
    ranklist, and the <s{i}-{j}> TI token renaming."""
    import json as _json
    import types

    # lora_manager.py imports diffusers (unused by lora_join) and .lora —
    # give it a package context + a stub so it loads without diffusers
    pkg = types.ModuleType("_refldm")
    pkg.__path__ = [REF_DIR]
    sys.modules["_refldm"] = pkg
    _load("_refldm.lora", "lora.py")
    had = sys.modules.get("diffusers")
    stub = types.ModuleType("diffusers")
    stub.StableDiffusionPipeline = object
    sys.modules["diffusers"] = stub
    try:
        ref_mgr = _load("_refldm.lora_manager", "lora_manager.py")
    finally:
        if had is None:
            sys.modules.pop("diffusers", None)
        else:
            sys.modules["diffusers"] = had

    from lora_tpu.formats.safetensors_io import safe_open as repo_open
    from lora_tpu.lora_manager import lora_join as repo_join

    rng = np.random.default_rng(5)
    model = ToyUNet()
    shapes = _ref_order_shapes(ref, model, TARGETS, [nn.Linear])
    paths = []
    for n, r in enumerate((2, 3)):  # different ranks per file
        pairs = [(rng.normal(0, 0.2, (o, r)).astype(np.float32),
                  rng.normal(0, 0.2, (r, i)).astype(np.float32))
                 for o, i in shapes]
        ti = {f"<tok{n}a>": rng.normal(0, 0.02, (CTX,)).astype(np.float32),
              f"<tok{n}b>": rng.normal(0, 0.02, (CTX,)).astype(np.float32)}
        p = str(tmp_path / f"join{n}.safetensors")
        save_safeloras_with_embeds({"unet": (pairs, TARGETS)}, ti, p,
                                   cast_fp16=False)
        paths.append(p)

    handles = [repo_open(p) for p in paths]
    try:
        got_t, got_m, got_ranks, got_tok = repo_join(handles)
    finally:
        for h in handles:
            h.close()

    from safetensors import safe_open as st_open

    ref_handles = [st_open(p, framework="pt") for p in paths]
    want_t, want_m, want_ranks, want_tok = ref_mgr.lora_join(ref_handles)

    assert got_ranks == want_ranks == [2, 3]
    assert got_tok == want_tok == [2, 2]
    assert set(got_t) == set(want_t)
    for k in want_t:
        np.testing.assert_allclose(
            np.asarray(got_t[k], np.float32),
            want_t[k].detach().float().numpy(), rtol=2e-3, atol=2e-3)
    assert set(got_m) == set(want_m)
    for k in want_m:
        if k == "unet":  # target set serialized as a json list — order-free
            assert set(_json.loads(got_m[k])) == set(_json.loads(want_m[k]))
        else:
            assert got_m[k] == want_m[k], k


def test_preprocess_geometry_matches_reference(tmp_path):
    """Salience crop geometry vs the live reference: _center_of_mass and
    _crop_to_square (preprocess_files.py:203-241) drive where every dataset
    image gets cropped — repo data/preprocess.py must agree exactly on
    off-center masks and both aspect orientations. (The model-backed
    BLIP/CLIPSeg branches are unverifiable here — no checkpoints — but the
    deterministic geometry is not.)"""
    import types

    from PIL import Image

    # preprocess_files.py imports `fire` (absent here, CLI-only) — stub it
    had = sys.modules.get("fire")
    stub = types.ModuleType("fire")
    stub.Fire = lambda *a, **k: None
    sys.modules["fire"] = stub
    try:
        ref_pp = _load("_ref_preprocess", "preprocess_files.py")
    finally:
        if had is None:
            sys.modules.pop("fire", None)
        else:
            sys.modules["fire"] = had

    from lora_tpu.data.preprocess import _center_of_mass, _crop_to_square

    rng = np.random.default_rng(7)
    for w, h in ((96, 64), (64, 96), (80, 80)):
        arr = np.zeros((h, w), np.uint8)
        # off-center blob
        arr[h // 5: h // 3, 2 * w // 3: w - 2] = 255
        arr += (rng.random((h, w)) * 20).astype(np.uint8)
        mask = Image.fromarray(arr, mode="L")

        com_ref = ref_pp._center_of_mass(mask)
        com_got = _center_of_mass(mask)
        np.testing.assert_allclose(com_got, com_ref, rtol=1e-6)

        img = Image.fromarray(
            (rng.random((h, w, 3)) * 255).astype(np.uint8))
        ref_crop = ref_pp._crop_to_square(img, list(com_ref), resize_to=32)
        got_crop = _crop_to_square(img, com_got, resize_to=32)
        np.testing.assert_array_equal(np.asarray(got_crop),
                                      np.asarray(ref_crop))


# ---------------------------------------------------------------------------
# (d) CompVis key maps vs to_ckpt_v2
# ---------------------------------------------------------------------------

def test_unet_key_map_matches_to_ckpt_v2(ref_ckpt):
    """ckpt_export.unet_key_map generates, from the model config, the same
    diffusers->CompVis key mapping to_ckpt_v2.convert_unet_state_dict
    (to_ckpt_v2.py:91-109) hardcodes — verified per key on the full
    SD-1.5-topology TINY_UNET param set (unique sentinel values track
    which source key each output key came from)."""
    from lora_tpu.formats.ckpt_export import _apply_map, unet_key_map
    from lora_tpu.models.config import TINY_UNET
    from lora_tpu.models.unet import init_unet

    keys = sorted(init_unet(TINY_UNET, jax.random.PRNGKey(0)))
    sentinels = {k: np.float32(i) for i, k in enumerate(keys)}

    got = _apply_map(sentinels, unet_key_map(TINY_UNET), "")
    want = ref_ckpt.convert_unet_state_dict(
        {k: torch.tensor(float(v)) for k, v in sentinels.items()})

    assert set(got) == set(want)
    for k in want:
        assert float(got[k]) == float(want[k]), k


def test_vae_key_map_matches_to_ckpt_v2(ref_ckpt):
    """vae_key_map vs convert_vae_state_dict (to_ckpt_v2.py:167-197). The
    reference expects the OLD diffusers attention naming (query/key/value/
    proj_attn); the repo models the new naming (to_q/.../to_out.0) — the
    comparison feeds each converter its own dialect of the same key set.
    Also pins the mid-attention 1x1-conv weight reshape both sides do."""
    from lora_tpu.formats.ckpt_export import _apply_map, vae_key_map
    from lora_tpu.models.config import TINY_VAE
    from lora_tpu.models.vae import init_vae

    new2old = {".to_q.": ".query.", ".to_k.": ".key.", ".to_v.": ".value.",
               ".to_out.0.": ".proj_attn."}
    keys = sorted(init_vae(TINY_VAE, jax.random.PRNGKey(0)))

    repo_in, ref_in = {}, {}
    for i, k in enumerate(keys):
        is_attn_w = ".attentions.0." in k and k.endswith(".weight") \
            and "group_norm" not in k
        # convert_to_ckpt expands attention projections to 1x1 convs before
        # mapping; mirror that here so values (incl. reshape) compare too
        v = (np.full((2, 2, 1, 1), np.float32(i)) if is_attn_w
             else np.float32(i))
        repo_in[k] = v
        ko = k
        for a, b in new2old.items():
            ko = ko.replace(a, b)
        # the reference reshapes 2-D attn weights itself (lines 181-190)
        ref_in[ko] = torch.tensor(np.full((2, 2), float(i))) if is_attn_w \
            else torch.tensor(float(i))

    got = _apply_map(repo_in, vae_key_map(TINY_VAE), "")
    want = ref_ckpt.convert_vae_state_dict(ref_in)

    assert set(got) == set(want)
    for k in want:
        w = want[k].numpy()
        g = np.asarray(got[k])
        assert g.shape == w.shape, k
        np.testing.assert_array_equal(g.reshape(-1)[0], w.reshape(-1)[0], k)
