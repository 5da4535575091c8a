"""LoRA pytree core: algebraic identities the reference relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import (
    add_lora,
    collapse_lora,
    init_lora,
    inspect_lora,
    join_loras,
    lora_delta_conv,
    lora_delta_dense,
    lora_from_pairs,
    lora_to_pairs,
    merge_loras,
    set_lora_diag,
    tune_lora_scale,
)
from lora_tpu.core.sites import Site

SITES = [
    Site("a.to_q", "linear", 16, 16),
    Site("a.to_out.0", "linear", 16, 16),
    Site("b.conv1", "conv", 8, 16, kernel=(3, 3), padding=(1, 1)),
]


def make_lora(seed=0, r=4, scale=1.0, random_up=False):
    lora = init_lora(SITES, r=r, rng=jax.random.PRNGKey(seed), scale=scale)
    if random_up:
        ks = jax.random.split(jax.random.PRNGKey(seed + 99), len(SITES))
        for (name, e), k in zip(sorted(lora["sites"].items()), ks):
            e["up"] = jax.random.normal(k, e["up"].shape) * 0.1
    return lora


def test_init_zero_up_means_no_delta():
    lora = make_lora()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    d = lora_delta_dense(x, lora["sites"]["a.to_q"], lora["scale"])
    np.testing.assert_allclose(np.asarray(d), 0.0)


def test_down_init_std():
    lora = init_lora([Site("w", "linear", 4096, 4096)], r=4,
                     rng=jax.random.PRNGKey(0))
    std = float(jnp.std(lora["sites"]["w"]["down"]))
    assert abs(std - 0.25) < 0.01  # N(0, 1/r)


def test_rank_validation():
    with pytest.raises(ValueError):
        init_lora([Site("w", "linear", 2, 2)], r=4, rng=jax.random.PRNGKey(0))


def test_scale_linearity():
    lora = make_lora(random_up=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    d1 = lora_delta_dense(x, lora["sites"]["a.to_q"], jnp.float32(1.0))
    d2 = lora_delta_dense(x, lora["sites"]["a.to_q"], jnp.float32(2.5))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1) * 2.5, rtol=1e-5)


def test_tune_scale_traced_no_structure_change():
    lora = make_lora(random_up=True)
    tuned = tune_lora_scale(lora, 0.5)
    assert jax.tree_util.tree_structure(lora) == jax.tree_util.tree_structure(tuned)
    assert float(tuned["scale"]) == 0.5


def test_pairs_roundtrip_applies_scale():
    lora = make_lora(scale=8.0, random_up=True)
    pairs = lora_to_pairs(lora, SITES)
    # realize_as_lora premultiplies up by scale (lora.py:60-61)
    np.testing.assert_allclose(
        pairs[0][0], np.asarray(lora["sites"]["a.to_q"]["up"]) * 8.0, rtol=1e-6
    )
    back = lora_from_pairs(pairs, SITES)  # load resets runtime scale to 1
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    d0 = lora_delta_dense(x, lora["sites"]["a.to_q"], lora["scale"])
    d1 = lora_delta_dense(x, back["sites"]["a.to_q"], back["scale"])
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5)


def test_merge_is_weighted_sum():
    l1, l2 = make_lora(0, random_up=True), make_lora(7, random_up=True)
    m = merge_loras(l1, l2, 0.3, 0.7)
    np.testing.assert_allclose(
        np.asarray(m["sites"]["a.to_q"]["down"]),
        0.3 * np.asarray(l1["sites"]["a.to_q"]["down"])
        + 0.7 * np.asarray(l2["sites"]["a.to_q"]["down"]),
        rtol=1e-6,
    )


def test_add_lora_alpha_beta():
    base, inc = make_lora(0, random_up=True), make_lora(5, random_up=True)
    out = add_lora(base, inc, alpha=0.4, beta=0.6)
    np.testing.assert_allclose(
        np.asarray(out["sites"]["a.to_q"]["up"]),
        0.4 * np.asarray(inc["sites"]["a.to_q"]["up"])
        + 0.6 * np.asarray(base["sites"]["a.to_q"]["up"]),
        rtol=1e-6,
    )


def test_join_block_diagonal_equivalence():
    """join + block-diag selector == sum of individually scaled LoRAs
    (the LoRAManager.tune contract, lora_manager.py:123-133)."""
    l1, l2 = make_lora(0, r=2, random_up=True), make_lora(9, r=3, random_up=True)
    joined, ranklist = join_loras([l1, l2])
    assert ranklist == [2, 3]
    assert joined["sites"]["a.to_q"]["down"].shape == (5, 16)
    s1, s2 = 0.7, 0.2
    diag = jnp.asarray([s1] * 2 + [s2] * 3)
    joined = set_lora_diag(joined, diag)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16))
    d_join = lora_delta_dense(x, joined["sites"]["a.to_q"], joined["scale"])
    d_sep = s1 * lora_delta_dense(x, l1["sites"]["a.to_q"], l1["scale"]) + \
        s2 * lora_delta_dense(x, l2["sites"]["a.to_q"], l2["scale"])
    np.testing.assert_allclose(np.asarray(d_join), np.asarray(d_sep), rtol=1e-4,
                               atol=1e-6)


def test_collapse_equals_runtime_linear():
    lora = make_lora(random_up=True)
    w = jax.random.normal(jax.random.PRNGKey(5), (16, 16))
    params = {"a.to_q.weight": w}
    alpha = 0.8
    collapsed = collapse_lora(params, {"sites": {"a.to_q": lora["sites"]["a.to_q"]},
                                       "scale": lora["scale"]}, alpha)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 16))
    y_runtime = x @ w.T + alpha * lora_delta_dense(
        x, lora["sites"]["a.to_q"], jnp.float32(1.0))
    y_collapsed = x @ collapsed["a.to_q.weight"].T
    np.testing.assert_allclose(np.asarray(y_runtime), np.asarray(y_collapsed),
                               rtol=1e-4, atol=1e-5)


def test_collapse_equals_runtime_conv():
    lora = make_lora(random_up=True)
    site = SITES[2]
    w = jax.random.normal(jax.random.PRNGKey(7), (16, 8, 3, 3)) * 0.1
    params = {"b.conv1.weight": w}
    collapsed = collapse_lora(
        params, {"sites": {"b.conv1": lora["sites"]["b.conv1"]},
                 "scale": lora["scale"]}, 1.0)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 5, 8))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "OIHW", "NHWC"))

    y_rt = conv(x, w) + lora_delta_conv(
        x, lora["sites"]["b.conv1"], jnp.float32(1.0), site.stride, site.padding)
    y_cl = conv(x, collapsed["b.conv1.weight"])
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y_cl), rtol=1e-4,
                               atol=1e-5)


def test_dropout_only_with_rng():
    lora = make_lora(random_up=True)
    x = jnp.ones((64, 16))
    d_det = lora_delta_dense(x, lora["sites"]["a.to_q"], lora["scale"])
    d_drop = lora_delta_dense(x, lora["sites"]["a.to_q"], lora["scale"],
                              dropout_rng=jax.random.PRNGKey(0), dropout_p=0.5)
    assert np.asarray(d_det).std() >= 0
    assert (np.asarray(d_drop) == 0).mean() > 0.2  # some rows dropped


def test_inspect_lora_zero_init():
    lora = make_lora()
    moved = inspect_lora(lora)
    assert all(v == [0.0] for v in moved.values())


def test_jit_apply():
    lora = make_lora(random_up=True)

    @jax.jit
    def f(lora, x):
        return lora_delta_dense(x, lora["sites"]["a.to_q"], lora["scale"])

    x = jax.random.normal(jax.random.PRNGKey(10), (2, 16))
    np.testing.assert_allclose(
        np.asarray(f(lora, x)),
        np.asarray(lora_delta_dense(x, lora["sites"]["a.to_q"], lora["scale"])),
        rtol=1e-5, atol=1e-6)
