"""LyCORIS (LoHa / LoKr / IA3 / DoRA / diag-OFT) interop
(formats/lycoris.py).

Each composition is checked against an independent numpy closed form of
the published algebra, and end-to-end patched forwards are checked against
collapse-into-base (delta entries must be EXACT, not approximations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import (
    collapse_lora,
    join_loras,
    lora_delta_conv,
    lora_delta_dense,
    lora_from_deltas,
    lora_to_pairs,
    stack_loras,
    tune_lora_scale,
)
from lora_tpu.core.sites import unet_locon_sites, unet_lora_sites
from lora_tpu.formats.kohya import kohya_key
from lora_tpu.formats.lycoris import is_lycoris, load_lycoris
from lora_tpu.formats.reader import save_file
from lora_tpu.models.config import TINY_TEXT, TINY_UNET

USITES = unet_lora_sites(TINY_UNET)
LSITES = unet_locon_sites(TINY_UNET)
LIN = USITES[0]                                       # attn1.to_q (c -> c)
FF = next(s for s in USITES if s.name.endswith("ff.net.0.proj"))  # c -> 8c
CONV = next(s for s in LSITES if s.name.endswith("resnets.0.conv1"))


def _save(tmp_path, tensors, name="lyco.safetensors"):
    p = str(tmp_path / name)
    save_file({k: np.asarray(v) for k, v in tensors.items()}, p)
    return p


def _loha_linear_tensors(site, r=3, alpha=None, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    key = kohya_key("unet", site.name)
    t = {
        key + ".hada_w1_a": rng.randn(site.out_dim, r).astype(dtype),
        key + ".hada_w1_b": rng.randn(r, site.in_dim).astype(dtype),
        key + ".hada_w2_a": rng.randn(site.out_dim, r).astype(dtype),
        key + ".hada_w2_b": rng.randn(r, site.in_dim).astype(dtype),
    }
    if alpha is not None:
        t[key + ".alpha"] = np.asarray(float(alpha), dtype)
    return t


def test_loha_linear_matches_closed_form(tmp_path):
    r, alpha = 3, 1.5
    t = _loha_linear_tensors(LIN, r=r, alpha=alpha)
    p = _save(tmp_path, t)
    assert is_lycoris(list(t))
    lu, lt = load_lycoris(p, unet_sites=USITES)
    assert lt is None and set(lu["sites"]) == {LIN.name}
    key = kohya_key("unet", LIN.name)
    want = ((t[key + ".hada_w1_a"] @ t[key + ".hada_w1_b"])
            * (t[key + ".hada_w2_a"] @ t[key + ".hada_w2_b"])) * (alpha / r)
    got = np.asarray(lu["sites"][LIN.name]["delta"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # forward application = one matmul with the delta
    x = np.random.RandomState(1).randn(4, LIN.in_dim).astype(np.float32)
    d = lora_delta_dense(jnp.asarray(x), lu["sites"][LIN.name], lu["scale"])
    np.testing.assert_allclose(np.asarray(d), x @ want.T, rtol=1e-4,
                               atol=1e-4)


def test_loha_default_alpha_is_rank(tmp_path):
    t = _loha_linear_tensors(FF, r=2, alpha=None, seed=3)
    lu, _ = load_lycoris(_save(tmp_path, t), unet_sites=USITES)
    key = kohya_key("unet", FF.name)
    want = ((t[key + ".hada_w1_a"] @ t[key + ".hada_w1_b"])
            * (t[key + ".hada_w2_a"] @ t[key + ".hada_w2_b"]))  # alpha/r = 1
    np.testing.assert_allclose(np.asarray(lu["sites"][FF.name]["delta"]),
                               want, rtol=1e-5, atol=1e-5)


def test_loha_conv_flat_and_tucker(tmp_path):
    """Non-Tucker conv factors span in*kh*kw; Tucker factors carry a
    (r, r, kh, kw) core. Both must compose to the same math as the
    explicit kernels."""
    r = 2
    rng = np.random.RandomState(5)
    key = kohya_key("unet", CONV.name)
    kh, kw = CONV.kernel
    # flat
    w1a = rng.randn(CONV.out_dim, r).astype(np.float32)
    w1b = rng.randn(r, CONV.in_dim * kh * kw).astype(np.float32)
    w2a = rng.randn(CONV.out_dim, r).astype(np.float32)
    w2b = rng.randn(r, CONV.in_dim * kh * kw).astype(np.float32)
    p = _save(tmp_path, {key + ".hada_w1_a": w1a, key + ".hada_w1_b": w1b,
                         key + ".hada_w2_a": w2a, key + ".hada_w2_b": w2b},
              "flat.safetensors")
    lu, _ = load_lycoris(p, unet_sites=LSITES)
    want = ((w1a @ w1b) * (w2a @ w2b)).reshape(CONV.out_dim, CONV.in_dim,
                                               kh, kw)
    np.testing.assert_allclose(np.asarray(lu["sites"][CONV.name]["delta"]),
                               want, rtol=1e-5, atol=1e-5)
    # the conv bypass equals an explicit convolution with the delta kernel
    x = jnp.asarray(rng.randn(2, 6, 6, CONV.in_dim).astype(np.float32))
    d = lora_delta_conv(x, lu["sites"][CONV.name], lu["scale"],
                        CONV.stride, CONV.padding)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(want), window_strides=CONV.stride,
        padding=[(CONV.padding[0],) * 2, (CONV.padding[1],) * 2],
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    # tucker
    t1 = rng.randn(r, r, kh, kw).astype(np.float32)
    t2 = rng.randn(r, r, kh, kw).astype(np.float32)
    u1a = rng.randn(r, CONV.out_dim).astype(np.float32)
    u1b = rng.randn(r, CONV.in_dim).astype(np.float32)
    u2a = rng.randn(r, CONV.out_dim).astype(np.float32)
    u2b = rng.randn(r, CONV.in_dim).astype(np.float32)
    p2 = _save(tmp_path, {key + ".hada_t1": t1, key + ".hada_w1_a": u1a,
                          key + ".hada_w1_b": u1b, key + ".hada_t2": t2,
                          key + ".hada_w2_a": u2a, key + ".hada_w2_b": u2b,
                          key + ".alpha": np.float32(r)},
               "tucker.safetensors")
    lu2, _ = load_lycoris(p2, unet_sites=LSITES)
    m1 = np.einsum("ijkl,ip,jr->prkl", t1, u1a, u1b)
    m2 = np.einsum("ijkl,ip,jr->prkl", t2, u2a, u2b)
    np.testing.assert_allclose(np.asarray(lu2["sites"][CONV.name]["delta"]),
                               m1 * m2, rtol=1e-4, atol=1e-4)


def test_lokr_linear_factored_and_full(tmp_path):
    """kron(w1, w2) with w1 full + w2 factored: alpha scales by the
    factored rank; with both sides full the multiplier is 1."""
    rng = np.random.RandomState(7)
    key = kohya_key("unet", LIN.name)
    # LIN is c -> c with c = TINY block width; pick kron block sizes
    out, inn = LIN.out_dim, LIN.in_dim
    o1, i1 = 4, 4
    o2, i2 = out // o1, inn // i1
    r, alpha = 2, 4.0
    w1 = rng.randn(o1, i1).astype(np.float32)
    w2a = rng.randn(o2, r).astype(np.float32)
    w2b = rng.randn(r, i2).astype(np.float32)
    p = _save(tmp_path, {key + ".lokr_w1": w1, key + ".lokr_w2_a": w2a,
                         key + ".lokr_w2_b": w2b,
                         key + ".alpha": np.float32(alpha)})
    lu, _ = load_lycoris(p, unet_sites=USITES)
    want = np.kron(w1, w2a @ w2b) * (alpha / r)
    np.testing.assert_allclose(np.asarray(lu["sites"][LIN.name]["delta"]),
                               want, rtol=1e-5, atol=1e-5)

    # both sides materialized -> alpha ignored (scale 1)
    w2 = rng.randn(o2, i2).astype(np.float32)
    p2 = _save(tmp_path, {key + ".lokr_w1": w1, key + ".lokr_w2": w2,
                          key + ".alpha": np.float32(alpha)},
               "full.safetensors")
    lu2, _ = load_lycoris(p2, unet_sites=USITES)
    np.testing.assert_allclose(np.asarray(lu2["sites"][LIN.name]["delta"]),
                               np.kron(w1, w2), rtol=1e-5, atol=1e-5)


def test_lokr_conv_full_w2_and_tucker(tmp_path):
    rng = np.random.RandomState(9)
    key = kohya_key("unet", CONV.name)
    kh, kw = CONV.kernel
    o1, i1 = 4, 4
    o2, i2 = CONV.out_dim // o1, CONV.in_dim // i1
    w1 = rng.randn(o1, i1).astype(np.float32)
    w2 = rng.randn(o2, i2, kh, kw).astype(np.float32)
    p = _save(tmp_path, {key + ".lokr_w1": w1, key + ".lokr_w2": w2})
    lu, _ = load_lycoris(p, unet_sites=LSITES)
    want = np.kron(w1[:, :, None, None], w2)
    np.testing.assert_allclose(np.asarray(lu["sites"][CONV.name]["delta"]),
                               want, rtol=1e-5, atol=1e-5)

    r = 2
    t2 = rng.randn(r, r, kh, kw).astype(np.float32)
    w2a = rng.randn(r, o2).astype(np.float32)
    w2b = rng.randn(r, i2).astype(np.float32)
    p2 = _save(tmp_path, {key + ".lokr_w1": w1, key + ".lokr_t2": t2,
                          key + ".lokr_w2_a": w2a, key + ".lokr_w2_b": w2b,
                          key + ".alpha": np.float32(r)},
               "tucker.safetensors")
    lu2, _ = load_lycoris(p2, unet_sites=LSITES)
    w2t = np.einsum("ijkl,ip,jr->prkl", t2, w2a, w2b)
    want2 = np.kron(w1[:, :, None, None], w2t)
    np.testing.assert_allclose(np.asarray(lu2["sites"][CONV.name]["delta"]),
                               want2, rtol=1e-4, atol=1e-4)


def test_ia3_needs_and_uses_base_weights(tmp_path):
    from lora_tpu.models.unet import init_unet

    params = init_unet(TINY_UNET, jax.random.PRNGKey(0))
    key = kohya_key("unet", LIN.name)
    v = np.random.RandomState(11).randn(LIN.in_dim).astype(np.float32)
    p = _save(tmp_path, {key + ".weight": v,
                         key + ".on_input": np.asarray(True)})
    with pytest.raises(ValueError, match="base weights"):
        load_lycoris(p, unet_sites=USITES)
    lu, _ = load_lycoris(p, unet_sites=USITES, unet_params=params)
    w = np.asarray(params[LIN.name + ".weight"], np.float32)
    np.testing.assert_allclose(np.asarray(lu["sites"][LIN.name]["delta"]),
                               w * v.reshape(1, -1), rtol=1e-5, atol=1e-6)

    # on_input=False gates the output axis
    v2 = np.random.RandomState(12).randn(LIN.out_dim).astype(np.float32)
    p2 = _save(tmp_path, {key + ".weight": v2,
                          key + ".on_input": np.asarray(False)},
               "out.safetensors")
    lu2, _ = load_lycoris(p2, unet_sites=USITES, unet_params=params)
    np.testing.assert_allclose(np.asarray(lu2["sites"][LIN.name]["delta"]),
                               w * v2.reshape(-1, 1), rtol=1e-5, atol=1e-6)


def test_mixed_algorithms_dispatch_per_module(tmp_path):
    """One file mixing a plain LoRA pair (stays factored) with a LoHa
    module (becomes a delta entry)."""
    rng = np.random.RandomState(13)
    r = 2
    kq = kohya_key("unet", LIN.name)
    tensors = {
        kq + ".lora_down.weight": rng.randn(r, LIN.in_dim).astype(np.float32),
        kq + ".lora_up.weight": rng.randn(LIN.out_dim, r).astype(np.float32),
        kq + ".alpha": np.float32(r),
    }
    tensors.update(_loha_linear_tensors(FF, r=2, seed=14))
    p = _save(tmp_path, tensors)
    lu, _ = load_lycoris(p, unet_sites=USITES)
    assert set(lu["sites"]) == {LIN.name, FF.name}
    assert "up" in lu["sites"][LIN.name] and "delta" not in lu["sites"][LIN.name]
    assert "delta" in lu["sites"][FF.name]


def test_patch_pipe_lycoris_equals_collapse(tmp_path):
    """End-to-end: a patched LyCORIS forward must equal folding the exact
    deltas into the base weights (delta entries are exact, and collapse
    supports them)."""
    from lora_tpu.models.unet import unet_forward
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    tensors = _loha_linear_tensors(LIN, r=2, alpha=1.0, seed=15)
    key = kohya_key("unet", CONV.name)
    rng = np.random.RandomState(16)
    o1, i1 = 4, 4
    o2, i2 = CONV.out_dim // o1, CONV.in_dim // i1
    kh, kw = CONV.kernel
    tensors[key + ".lokr_w1"] = 0.1 * rng.randn(o1, i1).astype(np.float32)
    tensors[key + ".lokr_w2"] = 0.1 * rng.randn(o2, i2, kh, kw).astype(
        np.float32)
    p = _save(tmp_path, tensors)

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    pipe.patch_pipe(p)
    assert pipe.lora_unet is not None
    assert {LIN.name, CONV.name} == set(pipe.lora_unet["sites"])

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    t = jnp.asarray([7])
    ctx = jax.random.normal(jax.random.PRNGKey(6),
                            (1, 4, TINY_UNET.cross_attention_dim))
    patched = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET,
                           lora=pipe.lora_unet)
    folded = collapse_lora(pipe.unet_params, pipe.lora_unet)
    want = unet_forward(folded, x, t, ctx, TINY_UNET, lora=None)
    base = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET, lora=None)
    assert float(jnp.abs(patched - base).max()) > 1e-6
    np.testing.assert_allclose(np.asarray(patched), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # scale tuning applies to delta entries without recompilation tricks
    pipe.tune_lora_scale(0.5)
    half = unet_forward(pipe.unet_params, x, t, ctx, TINY_UNET,
                        lora=pipe.lora_unet)
    assert float(jnp.abs(half - base).max()) < \
        float(jnp.abs(patched - base).max())


def test_unknown_factor_tensors_raise(tmp_path):
    # a mixed group — LoHa factors plus a norm-module tensor on the SAME
    # module — must refuse, not guess an algorithm
    tensors = _loha_linear_tensors(LIN, r=2, seed=17)
    key = kohya_key("unet", LIN.name)
    tensors[key + ".w_norm"] = np.zeros((LIN.out_dim,), np.float32)
    with pytest.raises(ValueError, match="unsupported factor tensors"):
        load_lycoris(_save(tmp_path, tensors), unet_sites=USITES)
    # a leaf no LyCORIS algorithm uses stays unrecognized
    t0 = _loha_linear_tensors(LIN, r=2, seed=20)
    t0[key + ".mystery_factor"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unrecognized LyCORIS key"):
        load_lycoris(_save(tmp_path, t0, "unk.safetensors"),
                     unet_sites=USITES)
    # a recognized leaf in an inconsistent group (LoHa factors + a DoRA
    # magnitude) must refuse the module, not guess an algorithm
    tensors2 = _loha_linear_tensors(LIN, r=2, seed=18)
    tensors2[key + ".dora_scale"] = np.ones((LIN.out_dim, 1), np.float32)
    with pytest.raises(ValueError, match="unsupported factor tensors"):
        load_lycoris(_save(tmp_path, tensors2, "mix.safetensors"),
                     unet_sites=USITES)


def test_delta_trees_refuse_factored_only_ops(tmp_path):
    deltas = [np.random.RandomState(19).randn(
        LIN.out_dim, LIN.in_dim).astype(np.float32)]
    tree = lora_from_deltas(deltas, [LIN])
    with pytest.raises(ValueError, match="no \\(up, down\\) factorization"):
        lora_to_pairs(tree, [LIN])
    with pytest.raises(ValueError, match="join requires factored"):
        join_loras([tree, tree])
    with pytest.raises(ValueError, match="stack requires factored"):
        stack_loras([tree, tree])
    # but scale tuning and collapse work
    scaled = tune_lora_scale(tree, 2.0)
    assert float(scaled["scale"]) == 2.0
    params = {LIN.name + ".weight":
              jnp.zeros((LIN.out_dim, LIN.in_dim), jnp.float32)}
    out = collapse_lora(params, tree)
    np.testing.assert_allclose(np.asarray(out[LIN.name + ".weight"]),
                               deltas[0], rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def unet_params():
    from lora_tpu.models.unet import init_unet

    return init_unet(TINY_UNET, jax.random.PRNGKey(0))


def test_dora_linear_matches_closed_form(tmp_path, unet_params):
    """DoRA: m * (W + dW) / ||W + dW||_row - W, row norm per output
    channel (the LyCORIS weight-decompose / PEFT algebra)."""
    rng = np.random.RandomState(21)
    r, alpha = 2, 1.5
    key = kohya_key("unet", LIN.name)
    up = rng.randn(LIN.out_dim, r).astype(np.float32)
    down = rng.randn(r, LIN.in_dim).astype(np.float32)
    m = (rng.rand(LIN.out_dim, 1) + 0.5).astype(np.float32)
    t = {key + ".lora_up.weight": up, key + ".lora_down.weight": down,
         key + ".alpha": np.float32(alpha), key + ".dora_scale": m}
    p = _save(tmp_path, t)
    assert is_lycoris(list(t))
    with pytest.raises(ValueError, match="base weights"):
        load_lycoris(p, unet_sites=USITES)
    lu, _ = load_lycoris(p, unet_sites=USITES, unet_params=unet_params)
    w = np.asarray(unet_params[LIN.name + ".weight"], np.float32)
    wp = w + (up @ down) * (alpha / r)
    norm = np.linalg.norm(wp, axis=1, keepdims=True) \
        + np.finfo(np.float32).eps
    want = m * wp / norm - w
    np.testing.assert_allclose(
        np.asarray(lu["sites"][LIN.name]["delta"]), want, rtol=1e-5,
        atol=1e-6)
    # tree scale lerps merged vs base weights — exactly LyCORIS's
    # multiplier semantics (merged = W + mult * (W' - W))
    half = tune_lora_scale(lu, 0.5)
    np.testing.assert_allclose(
        np.asarray(half["sites"][LIN.name]["delta"])
        * float(half["scale"]), 0.5 * want, rtol=1e-5, atol=1e-6)


def test_dora_conv_matches_closed_form(tmp_path, unet_params):
    rng = np.random.RandomState(22)
    r = 2
    kh, kw = CONV.kernel
    key = kohya_key("unet", CONV.name)
    up = rng.randn(CONV.out_dim, r, 1, 1).astype(np.float32)
    down = rng.randn(r, CONV.in_dim, kh, kw).astype(np.float32)
    m = (rng.rand(CONV.out_dim, 1, 1, 1) + 0.5).astype(np.float32)
    t = {key + ".lora_up.weight": up, key + ".lora_down.weight": down,
         key + ".dora_scale": m}
    lu, _ = load_lycoris(_save(tmp_path, t), unet_sites=LSITES,
                         unet_params=unet_params)
    w = np.asarray(unet_params[CONV.name + ".weight"], np.float32)
    dw = (up.reshape(CONV.out_dim, r) @ down.reshape(r, -1)).reshape(
        w.shape)  # default alpha = r -> multiplier 1
    wp = w + dw
    norm = np.linalg.norm(wp.reshape(wp.shape[0], -1), axis=1).reshape(
        -1, 1, 1, 1) + np.finfo(np.float32).eps
    want = m * wp / norm - w
    np.testing.assert_allclose(
        np.asarray(lu["sites"][CONV.name]["delta"]), want, rtol=1e-4,
        atol=1e-5)


def test_oft_linear_cayley_constraint_and_rescale(tmp_path, unet_params):
    """diag-OFT: per-block skew -> Cayley rotation of output channels;
    alpha clamps ||Q||_F at alpha*out_dim; rescale gains per channel."""
    rng = np.random.RandomState(23)
    key = kohya_key("unet", LIN.name)
    k = 4
    b = LIN.out_dim // k
    q = (0.1 * rng.randn(k, b, b)).astype(np.float32)
    p = _save(tmp_path, {key + ".oft_blocks": q})
    assert is_lycoris([key + ".oft_blocks"])
    lu, _ = load_lycoris(p, unet_sites=USITES, unet_params=unet_params)
    w = np.asarray(unet_params[LIN.name + ".weight"], np.float32)
    skew = q - q.transpose(0, 2, 1)
    eye = np.eye(b, dtype=np.float32)
    rot = np.matmul(eye + skew, np.linalg.inv(eye - skew))
    # the Cayley map of a skew matrix is orthogonal
    np.testing.assert_allclose(np.matmul(rot, rot.transpose(0, 2, 1)),
                               np.broadcast_to(eye, rot.shape), atol=1e-5)
    want = np.einsum("knm,knr->kmr", rot,
                     w.reshape(k, b, -1)).reshape(w.shape) - w
    np.testing.assert_allclose(
        np.asarray(lu["sites"][LIN.name]["delta"]), want, rtol=1e-4,
        atol=1e-5)

    # zero blocks -> identity rotation -> exactly zero delta
    pz = _save(tmp_path, {key + ".oft_blocks": np.zeros_like(q)},
               "zero.safetensors")
    luz, _ = load_lycoris(pz, unet_sites=USITES, unet_params=unet_params)
    assert float(np.abs(np.asarray(
        luz["sites"][LIN.name]["delta"])).max()) == 0.0

    # a binding constraint shrinks the skew before the Cayley map
    alpha = 1e-3
    pc = _save(tmp_path, {key + ".oft_blocks": q,
                          key + ".alpha": np.float32(alpha)},
               "con.safetensors")
    luc, _ = load_lycoris(pc, unet_sites=USITES, unet_params=unet_params)
    cmax = alpha * LIN.out_dim
    n = float(np.linalg.norm(skew))
    assert n > cmax  # the clamp must actually bind in this fixture
    skew_c = skew * ((min(n, cmax) + 1e-8) / (n + 1e-8))
    rot_c = np.matmul(eye + skew_c, np.linalg.inv(eye - skew_c))
    want_c = np.einsum("knm,knr->kmr", rot_c,
                       w.reshape(k, b, -1)).reshape(w.shape) - w
    np.testing.assert_allclose(
        np.asarray(luc["sites"][LIN.name]["delta"]), want_c, rtol=1e-4,
        atol=1e-6)

    # rescaled variant: per-output-channel gain after the rotation
    s = (rng.rand(LIN.out_dim, 1) + 0.5).astype(np.float32)
    pr = _save(tmp_path, {key + ".oft_blocks": q, key + ".rescale": s},
               "res.safetensors")
    lur, _ = load_lycoris(pr, unet_sites=USITES, unet_params=unet_params)
    want_r = s * np.einsum("knm,knr->kmr", rot,
                           w.reshape(k, b, -1)).reshape(w.shape) - w
    np.testing.assert_allclose(
        np.asarray(lur["sites"][LIN.name]["delta"]), want_r, rtol=1e-4,
        atol=1e-5)


def test_oft_conv_rotates_output_channels(tmp_path, unet_params):
    rng = np.random.RandomState(24)
    key = kohya_key("unet", CONV.name)
    k = 2
    b = CONV.out_dim // k
    q = (0.1 * rng.randn(k, b, b)).astype(np.float32)
    lu, _ = load_lycoris(_save(tmp_path, {key + ".oft_blocks": q}),
                         unet_sites=LSITES, unet_params=unet_params)
    w = np.asarray(unet_params[CONV.name + ".weight"], np.float32)
    skew = q - q.transpose(0, 2, 1)
    eye = np.eye(b, dtype=np.float32)
    rot = np.matmul(eye + skew, np.linalg.inv(eye - skew))
    want = np.einsum("knm,knr->kmr", rot,
                     w.reshape(k, b, -1)).reshape(w.shape) - w
    np.testing.assert_allclose(
        np.asarray(lu["sites"][CONV.name]["delta"]), want, rtol=1e-4,
        atol=1e-5)


def _butterfly_merge(w2d, rot, b):
    """Independent reimplementation of the BOFT butterfly apply (LyCORIS
    modules/boft.py make_weight) for the oracle side of the tests."""
    out = w2d.shape[0]
    inp = w2d
    r_b = b // 2
    for i in range(rot.shape[0]):
        k = (2 ** i) * r_b
        c = out // (2 * k)
        inp = inp.reshape(c, 2, k, -1).transpose(0, 2, 1, 3).reshape(out, -1)
        inp = inp.reshape(out // b, b, -1)
        inp = np.einsum("bij,bjr->bir", rot[i], inp).reshape(out, -1)
        inp = inp.reshape(c, k, 2, -1).transpose(0, 2, 1, 3).reshape(out, -1)
    return inp


def test_boft_butterfly_stages(tmp_path, unet_params):
    """BOFT (4-D oft_blocks): m butterfly stages of block rotations. The
    composed transform must be exactly orthogonal on the output channels
    (Gram matrix of the weight preserved), zero blocks must give a zero
    delta, and the delta must match an independent butterfly oracle."""
    rng = np.random.RandomState(31)
    key = kohya_key("unet", LIN.name)
    out = LIN.out_dim
    b = out // 4          # 4 blocks per stage
    m = 2                 # 2 butterfly stages
    q = (0.1 * rng.randn(m, out // b, b, b)).astype(np.float32)
    lu, _ = load_lycoris(_save(tmp_path, {key + ".oft_blocks": q}),
                         unet_sites=USITES, unet_params=unet_params)
    w = np.asarray(unet_params[LIN.name + ".weight"], np.float32)
    skew = q - q.transpose(0, 1, 3, 2)
    eye = np.eye(b, dtype=np.float32)
    rot = np.matmul(eye + skew, np.linalg.inv(eye - skew))
    want = _butterfly_merge(w, rot, b) - w
    got = np.asarray(lu["sites"][LIN.name]["delta"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # orthogonality of the whole composed transform: W'^T W' == W^T W
    wp = w + got
    np.testing.assert_allclose(wp.T @ wp, w.T @ w, rtol=1e-3, atol=1e-3)

    # zero blocks -> exactly zero delta
    luz, _ = load_lycoris(
        _save(tmp_path, {key + ".oft_blocks": np.zeros_like(q)},
              "bz.safetensors"),
        unet_sites=USITES, unet_params=unet_params)
    assert float(np.abs(np.asarray(
        luz["sites"][LIN.name]["delta"])).max()) == 0.0

    # rescaled variant applies after the last stage
    s = (rng.rand(out, 1) + 0.5).astype(np.float32)
    lur, _ = load_lycoris(
        _save(tmp_path, {key + ".oft_blocks": q, key + ".rescale": s},
              "br.safetensors"),
        unet_sites=USITES, unet_params=unet_params)
    want_r = s * (w + want) - w
    np.testing.assert_allclose(np.asarray(lur["sites"][LIN.name]["delta"]),
                               want_r, rtol=1e-4, atol=1e-5)


def test_boft_conv_and_bad_shapes(tmp_path, unet_params):
    rng = np.random.RandomState(32)
    key = kohya_key("unet", CONV.name)
    out = CONV.out_dim
    b = out // 2
    q = (0.1 * rng.randn(1, 2, b, b)).astype(np.float32)
    lu, _ = load_lycoris(_save(tmp_path, {key + ".oft_blocks": q}),
                         unet_sites=LSITES, unet_params=unet_params)
    w = np.asarray(unet_params[CONV.name + ".weight"], np.float32)
    skew = q - q.transpose(0, 1, 3, 2)
    eye = np.eye(b, dtype=np.float32)
    rot = np.matmul(eye + skew, np.linalg.inv(eye - skew))
    want = (_butterfly_merge(w.reshape(out, -1), rot, b)
            .reshape(w.shape) - w)
    np.testing.assert_allclose(np.asarray(lu["sites"][CONV.name]["delta"]),
                               want, rtol=1e-4, atol=1e-5)

    lkey = kohya_key("unet", LIN.name)
    # odd block size can't butterfly
    qodd = np.zeros((1, LIN.out_dim // 5, 5, 5), np.float32)
    with pytest.raises(ValueError, match="even-sized"):
        load_lycoris(_save(tmp_path, {lkey + ".oft_blocks": qodd},
                           "bo.safetensors"),
                     unet_sites=USITES, unet_params=unet_params)
    # diag-OFT block grid that doesn't tile the output axis
    qbad = np.zeros((3, 5, 5), np.float32)
    with pytest.raises(ValueError, match="output axis has"):
        load_lycoris(_save(tmp_path, {lkey + ".oft_blocks": qbad},
                           "bad.safetensors"),
                     unet_sites=USITES, unet_params=unet_params)


def _butterfly_oracle(w2d, rot, b):
    """SECOND independent BOFT oracle built from explicit permutation and
    block-diagonal matrices — no reshape/transpose bookkeeping shared with
    _compose_boft (or with _butterfly_merge above, which transcribes it):
    stage i applies P_i^T . blockdiag(rot_i) . P_i, where P_i gathers the
    output channels in butterfly order (wing stride 2^i * b/2)."""
    out = w2d.shape[0]
    acc = np.asarray(w2d, np.float64)
    r_b = b // 2
    n = out // b
    for i in range(rot.shape[0]):
        k = (2 ** i) * r_b
        c = out // (2 * k)
        perm = [ci * 2 * k + gi * k + ki
                for ci in range(c) for ki in range(k) for gi in range(2)]
        P = np.eye(out)[perm]
        B = np.zeros((out, out))
        for bi in range(n):
            B[bi * b:(bi + 1) * b, bi * b:(bi + 1) * b] = rot[i, bi]
        acc = P.T @ B @ P @ acc
    return acc


def test_boft_matches_permutation_matrix_oracle(tmp_path, unet_params):
    """The butterfly apply agrees with an explicit permutation-matrix +
    block-diagonal construction (structurally independent of the loader's
    reshape/transpose implementation)."""
    rng = np.random.RandomState(41)
    key = kohya_key("unet", LIN.name)
    out = LIN.out_dim
    b = out // 4
    q = (0.1 * rng.randn(2, out // b, b, b)).astype(np.float32)
    lu, _ = load_lycoris(_save(tmp_path, {key + ".oft_blocks": q}),
                         unet_sites=USITES, unet_params=unet_params)
    w = np.asarray(unet_params[LIN.name + ".weight"], np.float32)
    skew = q - q.transpose(0, 1, 3, 2)
    eye = np.eye(b, dtype=np.float32)
    rot = np.matmul(eye + skew, np.linalg.inv(eye - skew))
    want = _butterfly_oracle(w, rot, b) - w
    np.testing.assert_allclose(np.asarray(lu["sites"][LIN.name]["delta"]),
                               want, rtol=1e-4, atol=1e-5)


def test_boft_hand_computed_4_channel(tmp_path):
    """Fully hand-derived 4-channel BOFT golden: 2 stages of 2x2 Givens
    blocks. Stage 0 pairs channels (0,1),(2,3); stage 1's butterfly pairs
    (0,2),(1,3). Cayley of skew [[0,s],[-s,0]] has the closed form
    1/(1+s^2) * [[1-s^2, 2s],[-2s, 1-s^2]] — the expected merged weight is
    built from those literals and explicit index bookkeeping only."""
    from lora_tpu.core.sites import Site

    site = Site("fake.proj", "linear", 3, 4)
    w = np.arange(12, dtype=np.float32).reshape(4, 3) / 7.0 + 0.25
    params = {"fake.proj.weight": w}

    s = [0.3, -0.5, 0.2, 0.7]
    q = np.zeros((2, 2, 2, 2), np.float32)
    q[0, 0, 0, 1], q[0, 1, 0, 1] = s[0], s[1]   # stage 0: blocks (0,1),(2,3)
    q[1, 0, 0, 1], q[1, 1, 0, 1] = s[2], s[3]   # stage 1: blocks (0,2),(1,3)

    def giv(v):
        d = 1.0 + v * v
        return np.array([[(1 - v * v) / d, 2 * v / d],
                         [-2 * v / d, (1 - v * v) / d]])

    r0 = np.zeros((4, 4))
    r0[:2, :2], r0[2:, 2:] = giv(s[0]), giv(s[1])
    r1 = np.zeros((4, 4))
    for (a, c_), g in (((0, 2), giv(s[2])), ((1, 3), giv(s[3]))):
        r1[a, a], r1[a, c_] = g[0, 0], g[0, 1]
        r1[c_, a], r1[c_, c_] = g[1, 0], g[1, 1]
    want = r1 @ r0 @ w - w

    key = kohya_key("unet", site.name)
    lu, _ = load_lycoris(_save(tmp_path, {key + ".oft_blocks": q}),
                         unet_sites=[site], unet_params=params)
    np.testing.assert_allclose(np.asarray(lu["sites"][site.name]["delta"]),
                               want, rtol=1e-5, atol=1e-6)


def test_boft_alpha_clamp_is_global(tmp_path, unet_params):
    """alpha > 0 clamps ||Q||_F over the WHOLE (m, n, b, b) skew tensor —
    ONE factor across all stages (LyCORIS boft.py get_r calls torch.norm on
    the full tensor), not per stage. Stage 0 is made huge and stage 1 tiny
    so the two granularities disagree: a per-stage clamp would leave stage
    1 untouched while the global factor shrinks it too."""
    rng = np.random.RandomState(43)
    key = kohya_key("unet", LIN.name)
    out = LIN.out_dim
    b = out // 4
    alpha = 0.05
    q = np.stack([
        (5.0 * rng.randn(out // b, b, b)).astype(np.float32),   # huge
        (0.01 * rng.randn(out // b, b, b)).astype(np.float32),  # tiny
    ])
    lu, _ = load_lycoris(
        _save(tmp_path, {key + ".oft_blocks": q,
                         key + ".alpha": np.float32(alpha)}),
        unet_sites=USITES, unet_params=unet_params)
    got = np.asarray(lu["sites"][LIN.name]["delta"])

    w = np.asarray(unet_params[LIN.name + ".weight"], np.float32)
    skew = q - q.transpose(0, 1, 3, 2)
    constraint = alpha * out
    assert np.linalg.norm(skew[1]) < constraint < np.linalg.norm(skew)

    def rotations(sk):
        eye = np.eye(b, dtype=np.float32)
        return np.matmul(eye + sk, np.linalg.inv(eye - sk))

    # global clamp: one factor over the full tensor (the LyCORIS formula)
    sk_g = skew * (constraint / np.linalg.norm(skew))
    want = _butterfly_oracle(w, rotations(sk_g), b) - w
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # a per-stage clamp would give a materially different delta — the
    # assertion above discriminates, it isn't vacuous
    sk_p = skew.copy()
    for i in range(2):
        n_i = np.linalg.norm(skew[i])
        if n_i > constraint:
            sk_p[i] = skew[i] * (constraint / n_i)
    per_stage = _butterfly_oracle(w, rotations(sk_p), b) - w
    assert np.abs(per_stage - want).max() > 1e-3


# ---------------------------------------------------------------------------
# GLoRA / full / norm modules (round 5): the last LyCORIS algorithms


def test_glora_linear_matches_closed_form(tmp_path, unet_params):
    """GLoRA (W' = W + W.A + B): A = a2 @ a1 on the input of the frozen
    weight, B = b2 @ b1 a plain bypass, both * alpha/r."""
    rng = np.random.RandomState(51)
    key = kohya_key("unet", LIN.name)
    r, alpha = 3, 1.5
    a1 = (0.1 * rng.randn(r, LIN.in_dim)).astype(np.float32)
    a2 = (0.1 * rng.randn(LIN.in_dim, r)).astype(np.float32)
    b1 = (0.1 * rng.randn(r, LIN.in_dim)).astype(np.float32)
    b2 = (0.1 * rng.randn(LIN.out_dim, r)).astype(np.float32)
    t = {key + ".a1.weight": a1, key + ".a2.weight": a2,
         key + ".b1.weight": b1, key + ".b2.weight": b2,
         key + ".alpha": np.float32(alpha)}
    assert is_lycoris(list(t))
    lu, _ = load_lycoris(_save(tmp_path, t), unet_sites=USITES,
                         unet_params=unet_params)
    w = np.asarray(unet_params[LIN.name + ".weight"], np.float32)
    want = (w @ (a2 @ a1) + b2 @ b1) * (alpha / r)
    np.testing.assert_allclose(np.asarray(lu["sites"][LIN.name]["delta"]),
                               want, rtol=1e-4, atol=1e-6)
    # base weights are required (the W.A term)
    with pytest.raises(ValueError, match="needs the unet base weights"):
        load_lycoris(_save(tmp_path, t, "g2.safetensors"),
                     unet_sites=USITES)


def test_glora_conv_and_bad_kernels(tmp_path, unet_params):
    rng = np.random.RandomState(52)
    key = kohya_key("unet", CONV.name)
    r = 2
    kh, kw = CONV.kernel
    a1 = (0.1 * rng.randn(r, CONV.in_dim, 1, 1)).astype(np.float32)
    a2 = (0.1 * rng.randn(CONV.in_dim, r, 1, 1)).astype(np.float32)
    b1 = (0.1 * rng.randn(r, CONV.in_dim, 1, 1)).astype(np.float32)
    b2 = (0.1 * rng.randn(CONV.out_dim, r, kh, kw)).astype(np.float32)
    t = {key + ".a1.weight": a1, key + ".a2.weight": a2,
         key + ".b1.weight": b1, key + ".b2.weight": b2}
    lu, _ = load_lycoris(_save(tmp_path, t), unet_sites=LSITES,
                         unet_params=unet_params)
    w = np.asarray(unet_params[CONV.name + ".weight"],
                   np.float32).reshape(CONV.out_dim, CONV.in_dim, kh, kw)
    A = a2[..., 0, 0] @ a1[..., 0, 0]
    want = (np.einsum("oihw,ij->ojhw", w, A)
            + np.einsum("orhw,ri->oihw", b2, b1[..., 0, 0]))  # alpha=r
    np.testing.assert_allclose(np.asarray(lu["sites"][CONV.name]["delta"]),
                               want, rtol=1e-4, atol=1e-6)
    # a non-1x1 bottleneck conv is not a GLoRA factorization
    bad = dict(t)
    bad[key + ".a1.weight"] = (0.1 * rng.randn(r, CONV.in_dim, 3, 3)).astype(
        np.float32)
    with pytest.raises(ValueError, match="1x1"):
        load_lycoris(_save(tmp_path, bad, "gb.safetensors"),
                     unet_sites=LSITES, unet_params=unet_params)


def test_full_module_diff_and_bias(tmp_path, unet_params):
    """full modules: `diff` IS the weight delta; `diff_b` rides the tree's
    param_deltas channel keyed by the flat bias path."""
    rng = np.random.RandomState(53)
    key = kohya_key("unet", FF.name)
    diff = (0.01 * rng.randn(FF.out_dim, FF.in_dim)).astype(np.float32)
    diff_b = (0.01 * rng.randn(FF.out_dim)).astype(np.float32)
    t = {key + ".diff": diff, key + ".diff_b": diff_b}
    assert is_lycoris(list(t))
    lu, _ = load_lycoris(_save(tmp_path, t), unet_sites=USITES,
                         unet_params=unet_params)
    np.testing.assert_allclose(np.asarray(lu["sites"][FF.name]["delta"]),
                               diff, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(lu["param_deltas"][FF.name + ".bias"],
                               diff_b, rtol=1e-6)
    # bias diff on a bias-less site (attn to_q) refuses loudly
    kq = kohya_key("unet", LIN.name)
    t2 = {kq + ".diff": (0.01 * rng.randn(LIN.out_dim, LIN.in_dim)).astype(
        np.float32),
        kq + ".diff_b": (0.01 * rng.randn(LIN.out_dim)).astype(np.float32)}
    with pytest.raises(ValueError, match="no bias parameter"):
        load_lycoris(_save(tmp_path, t2, "f2.safetensors"),
                     unet_sites=USITES, unet_params=unet_params)
    # wrong diff shape refuses
    t3 = {key + ".diff": diff.T.copy()}
    with pytest.raises(ValueError, match="composes to"):
        load_lycoris(_save(tmp_path, t3, "f3.safetensors"),
                     unet_sites=USITES, unet_params=unet_params)


def test_norm_module_param_deltas(tmp_path, unet_params):
    """norm modules (train_norm=True): w_norm/b_norm deltas resolve to the
    GroupNorm/LayerNorm param paths via the model's own param index."""
    rng = np.random.RandomState(54)
    npath = "down_blocks.0.resnets.0.norm1"
    base = "lora_unet_" + npath.replace(".", "_")
    c = np.asarray(unet_params[npath + ".weight"]).shape[0]
    wn = (0.05 * rng.randn(c)).astype(np.float32)
    bn = (0.05 * rng.randn(c)).astype(np.float32)
    t = {base + ".w_norm": wn, base + ".b_norm": bn}
    assert is_lycoris(list(t))
    lu, _ = load_lycoris(_save(tmp_path, t), unet_sites=USITES,
                         unet_params=unet_params)
    assert lu["sites"] == {}
    np.testing.assert_allclose(lu["param_deltas"][npath + ".weight"], wn)
    np.testing.assert_allclose(lu["param_deltas"][npath + ".bias"], bn)
    # needs params to resolve the layer path
    with pytest.raises(ValueError, match="needs unet_params"):
        load_lycoris(_save(tmp_path, t, "n2.safetensors"),
                     unet_sites=USITES)
    # a base that matches no parameter path refuses
    t3 = {"lora_unet_nowhere_norm9.w_norm": wn}
    with pytest.raises(ValueError, match="does not match any unet"):
        load_lycoris(_save(tmp_path, t3, "n3.safetensors"),
                     unet_sites=USITES, unet_params=unet_params)
    # shape mismatch refuses
    t4 = {base + ".w_norm": wn[:-1]}
    with pytest.raises(ValueError, match="w_norm"):
        load_lycoris(_save(tmp_path, t4, "n4.safetensors"),
                     unet_sites=USITES, unet_params=unet_params)


def test_norm_full_modules_pipe_lifecycle(tmp_path):
    """End-to-end base-delta channel: patch_pipe applies norm w/b deltas
    and full-module bias diffs to the BASE params; tune_lora_scale lerps
    them exactly (alpha=0 == unpatched); remove_lora restores originals
    bit-for-bit; collapse folds at the given alpha and drops the record;
    re-patching another adapter restores the first one's params."""
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(2), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    rng = np.random.RandomState(60)
    npath = "down_blocks.0.resnets.0.norm1"
    nbase = "lora_unet_" + npath.replace(".", "_")
    c = np.asarray(pipe.unet_params[npath + ".weight"]).shape[0]
    wn = (0.3 * rng.randn(c)).astype(np.float32)
    bn = (0.3 * rng.randn(c)).astype(np.float32)
    fkey = kohya_key("unet", FF.name)
    diff = (0.05 * rng.randn(FF.out_dim, FF.in_dim)).astype(np.float32)
    diff_b = (0.05 * rng.randn(FF.out_dim)).astype(np.float32)
    p = _save(tmp_path, {nbase + ".w_norm": wn, nbase + ".b_norm": bn,
                         fkey + ".diff": diff, fkey + ".diff_b": diff_b})

    orig_w = np.asarray(pipe.unet_params[npath + ".weight"]).copy()
    orig_b = np.asarray(pipe.unet_params[FF.name + ".bias"]).copy()
    kwargs = dict(num_inference_steps=2, height=64, width=64)
    base_img = pipe("a cat", rng=jax.random.PRNGKey(3), **kwargs)

    pipe.patch_pipe(p)
    assert pipe.lora_unet is not None  # the full-module weight diff
    assert set(pipe.lora_unet["sites"]) == {FF.name}
    assert "param_deltas" not in pipe.lora_unet  # popped into the pipe
    assert pipe.has_base_deltas("unet")
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig_w + wn,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".bias"]),
        np.asarray(pipe.base_deltas["unet"]["orig"][npath + ".bias"]) + bn,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[FF.name + ".bias"]), orig_b + diff_b,
        rtol=1e-6)
    patched_img = pipe("a cat", rng=jax.random.PRNGKey(3), **kwargs)
    assert np.abs(patched_img - base_img).max() > 1e-4

    # exact lerp: alpha 0 == unpatched forward
    pipe.tune_lora_scale(0.0)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig_w, rtol=1e-6)
    zero_img = pipe("a cat", rng=jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_allclose(zero_img, base_img, atol=1e-5)
    pipe.tune_lora_scale(0.5)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig_w + 0.5 * wn,
        rtol=1e-5)

    # remove restores the base exactly
    pipe.remove_lora()
    assert pipe.base_deltas is None
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig_w, rtol=0)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[FF.name + ".bias"]), orig_b, rtol=0)
    removed_img = pipe("a cat", rng=jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_allclose(removed_img, base_img, atol=1e-6)

    # collapse folds at alpha and drops the restore record
    pipe.patch_pipe(p)
    collapsed_img_pre = pipe("a cat", rng=jax.random.PRNGKey(3), **kwargs)
    pipe.collapse_lora(1.0)
    assert pipe.base_deltas is None and pipe.lora_unet is None
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig_w + wn,
        rtol=1e-6)
    collapsed_img = pipe("a cat", rng=jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_allclose(collapsed_img, collapsed_img_pre, atol=2e-4)


def test_norm_deltas_repatch_restores_previous(tmp_path):
    """Patching adapter B over adapter A first restores A's base-param
    edits — deltas never stack across patch_pipe calls."""
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(4), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    npath = "down_blocks.0.resnets.0.norm1"
    nbase = "lora_unet_" + npath.replace(".", "_")
    c = np.asarray(pipe.unet_params[npath + ".weight"]).shape[0]
    orig = np.asarray(pipe.unet_params[npath + ".weight"]).copy()
    pa = _save(tmp_path, {nbase + ".w_norm": np.full(c, 1.0, np.float32)},
               "a.safetensors")
    pb = _save(tmp_path, {nbase + ".w_norm": np.full(c, -2.0, np.float32)},
               "b.safetensors")
    pipe.patch_pipe(pa)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig + 1.0,
        rtol=1e-6)
    pipe.patch_pipe(pb)  # replaces, does not stack
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig - 2.0,
        rtol=1e-6)
    pipe.remove_lora()
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig, rtol=0)


def test_norm_deltas_cleared_by_plain_lora_repatch(tmp_path):
    """Replacing a LyCORIS norm adapter with a PLAIN kohya LoRA (no
    LyCORIS branch) must also restore the previous adapter's base-param
    edits — the clear cannot live only on the LyCORIS load path."""
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(4), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT)
    npath = "down_blocks.0.resnets.0.norm1"
    nbase = "lora_unet_" + npath.replace(".", "_")
    c = np.asarray(pipe.unet_params[npath + ".weight"]).shape[0]
    orig = np.asarray(pipe.unet_params[npath + ".weight"]).copy()
    pa = _save(tmp_path, {nbase + ".w_norm": np.full(c, 1.0, np.float32)},
               "a.safetensors")
    rng = np.random.RandomState(7)
    lkey = kohya_key("unet", LIN.name)
    pb = _save(tmp_path, {
        lkey + ".lora_down.weight": rng.randn(2, LIN.in_dim).astype(
            np.float32),
        lkey + ".lora_up.weight": rng.randn(LIN.out_dim, 2).astype(
            np.float32),
        lkey + ".alpha": np.asarray(2.0, np.float32)}, "b.safetensors")
    pipe.patch_pipe(pa)
    assert pipe.has_base_deltas("unet")
    pipe.patch_pipe(pb)  # plain kohya branch — must still restore
    assert not pipe.has_base_deltas("unet")
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params[npath + ".weight"]), orig, rtol=0)
    assert pipe.lora_unet is not None and LIN.name in pipe.lora_unet["sites"]


def test_norm_module_xl_te2(tmp_path):
    """SDXL: a norm module under lora_te2_ resolves against te2's params
    and keys the pipe's base-delta channel on text_encoder_2."""
    from lora_tpu.models.config import (
        TINY_VAE,
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    npath = "text_model.encoder.layers.0.layer_norm1"
    base = "lora_te2_" + npath.replace(".", "_")
    c = np.asarray(pipe.text2_params[npath + ".weight"]).shape[0]
    wn = np.full(c, 0.5, np.float32)
    p = _save(tmp_path, {base + ".w_norm": wn})
    orig = np.asarray(pipe.text2_params[npath + ".weight"]).copy()
    c1, p1 = pipe.encode_prompt_xl("a cat")
    pipe.patch_pipe(p)
    assert pipe.has_base_deltas("text_encoder_2")
    assert not pipe.has_base_deltas("text_encoder")
    np.testing.assert_allclose(
        np.asarray(pipe.text2_params[npath + ".weight"]), orig + wn,
        rtol=1e-6)
    c2, p2 = pipe.encode_prompt_xl("a cat")
    d1 = TINY_XL_TEXT.hidden_size
    # te1's half of the context is untouched; te2's half moved
    np.testing.assert_allclose(np.asarray(c2[..., :d1]),
                               np.asarray(c1[..., :d1]), atol=1e-6)
    assert np.abs(np.asarray(c2[..., d1:]) - np.asarray(c1[..., d1:])).max() \
        > 1e-4
    pipe.tune_lora_scale(0.0)
    c0, _ = pipe.encode_prompt_xl("a cat")
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-5)
    pipe.remove_lora()
    np.testing.assert_allclose(
        np.asarray(pipe.text2_params[npath + ".weight"]), orig, rtol=0)
