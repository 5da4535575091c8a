"""Model forward passes: shapes, jit, LoRA integration, scheduler math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import collapse_lora, init_lora, tune_lora_scale
from lora_tpu.core.sites import text_encoder_lora_sites, unet_lora_sites
from lora_tpu.models import schedulers
from lora_tpu.models.clip import clip_text_forward, init_clip_text
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.models.unet import init_unet, unet_forward
from lora_tpu.models.vae import init_vae, vae_decode, vae_encode

B = 2


@pytest.fixture(scope="module")
def unet_params():
    return init_unet(TINY_UNET, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def text_params():
    return init_clip_text(TINY_TEXT, jax.random.PRNGKey(1))


@pytest.fixture(scope="module")
def vae_params():
    return init_vae(TINY_VAE, jax.random.PRNGKey(2))


def unet_inputs(seed=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    sample = jax.random.normal(k1, (B, 8, 8, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(k2, (B, 7, TINY_UNET.cross_attention_dim))
    return sample, t, ctx


def test_unet_forward_shape(unet_params):
    sample, t, ctx = unet_inputs()
    out = unet_forward(unet_params, sample, t, ctx, TINY_UNET)
    assert out.shape == (B, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_unet_jit_matches_eager(unet_params):
    sample, t, ctx = unet_inputs()
    f = jax.jit(lambda p, s, t, c: unet_forward(p, s, t, c, TINY_UNET))
    # on TPU, jit fusion moves rounding points vs op-by-op eager (~2e-5
    # max observed); on CPU the two paths agree to float noise
    tol = 1e-4 if jax.default_backend() in ("tpu", "axon") else 1e-5
    np.testing.assert_allclose(
        np.asarray(f(unet_params, sample, t, ctx)),
        np.asarray(unet_forward(unet_params, sample, t, ctx, TINY_UNET)),
        rtol=2 * tol, atol=tol,
    )


def test_unet_lora_zero_init_is_noop(unet_params):
    sample, t, ctx = unet_inputs()
    sites = unet_lora_sites(TINY_UNET)
    lora = init_lora(sites, r=4, rng=jax.random.PRNGKey(9))
    base = unet_forward(unet_params, sample, t, ctx, TINY_UNET)
    with_lora = unet_forward(unet_params, sample, t, ctx, TINY_UNET, lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               atol=1e-6)


def rand_lora(sites, r=4, seed=11):
    lora = init_lora(sites, r=r, rng=jax.random.PRNGKey(seed))
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), len(lora["sites"]))
    for (name, e), k in zip(sorted(lora["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.05
    return lora


def test_unet_lora_changes_output_and_scales(unet_params):
    sample, t, ctx = unet_inputs()
    sites = unet_lora_sites(TINY_UNET)
    lora = rand_lora(sites)
    base = np.asarray(unet_forward(unet_params, sample, t, ctx, TINY_UNET))
    out1 = np.asarray(unet_forward(unet_params, sample, t, ctx, TINY_UNET,
                                   lora=lora))
    assert np.abs(out1 - base).max() > 1e-4
    out0 = np.asarray(unet_forward(unet_params, sample, t, ctx, TINY_UNET,
                                   lora=tune_lora_scale(lora, 0.0)))
    np.testing.assert_allclose(out0, base, atol=1e-6)


def test_unet_collapse_equals_runtime(unet_params):
    """collapse(alpha=1) into base == runtime LoRA at scale 1 (the upl-mode
    contract, cli_lora_add.py:109-127)."""
    sample, t, ctx = unet_inputs()
    sites = unet_lora_sites(TINY_UNET)
    lora = rand_lora(sites)
    runtime = np.asarray(unet_forward(unet_params, sample, t, ctx, TINY_UNET,
                                      lora=lora))
    collapsed_params = collapse_lora(unet_params, lora, alpha=1.0)
    collapsed = np.asarray(unet_forward(collapsed_params, sample, t, ctx,
                                        TINY_UNET))
    np.testing.assert_allclose(runtime, collapsed, rtol=5e-4, atol=5e-5)


def test_clip_forward_and_causality(text_params):
    ids = jnp.array([[1, 5, 9, 2, 0, 0, 0], [3, 4, 4, 4, 4, 4, 2]])
    out = clip_text_forward(text_params, ids, TINY_TEXT)
    assert out.shape == (2, 7, TINY_TEXT.hidden_size)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 5].set(7)
    out2 = clip_text_forward(text_params, ids2, TINY_TEXT)
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.asarray(out2[0, :5]),
                               atol=1e-5)
    assert np.abs(np.asarray(out[0, 5:]) - np.asarray(out2[0, 5:])).max() > 1e-5


def test_clip_ti_scatter_differentiable(text_params):
    ids = jnp.array([[1, 998, 2, 0]])
    ti_ids = jnp.array([998, 999])
    ti_embeds = jnp.zeros((2, TINY_TEXT.hidden_size))

    def loss(emb):
        out = clip_text_forward(text_params, ids, TINY_TEXT,
                                ti_embeds=emb, ti_ids=ti_ids)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(ti_embeds)
    assert np.abs(np.asarray(g[0])).max() > 0  # used token gets grads
    np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-8)  # unused


def test_clip_lora_sites_bind(text_params):
    sites = text_encoder_lora_sites(TINY_TEXT)
    lora = rand_lora(sites, seed=21)
    ids = jnp.array([[1, 5, 9, 2]])
    base = np.asarray(clip_text_forward(text_params, ids, TINY_TEXT))
    out = np.asarray(clip_text_forward(text_params, ids, TINY_TEXT, lora=lora))
    assert np.abs(out - base).max() > 1e-5


def test_vae_roundtrip_shapes(vae_params):
    x = jax.random.normal(jax.random.PRNGKey(4), (B, 32, 32, 3)) * 0.5
    z = vae_encode(vae_params, x, TINY_VAE, jax.random.PRNGKey(5))
    assert z.shape == (B, 4, 4, TINY_VAE.latent_channels)
    y = vae_decode(vae_params, z, TINY_VAE)
    assert y.shape == (B, 32, 32, 3)
    assert bool(jnp.isfinite(y).all())


def test_vae_encode_deterministic_mode(vae_params):
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3))
    z1 = vae_encode(vae_params, x, TINY_VAE, jax.random.PRNGKey(0), sample=False)
    z2 = vae_encode(vae_params, x, TINY_VAE, jax.random.PRNGKey(1), sample=False)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


# ---------------------------------------------------------------------------
# schedulers
# ---------------------------------------------------------------------------

def test_schedule_values_match_sd15():
    s = schedulers.make_schedule()
    a = np.asarray(s.alphas_cumprod)
    assert a.shape == (1000,)
    # known endpoints of the SD scaled_linear schedule
    np.testing.assert_allclose(a[0], 1 - 0.00085, rtol=1e-5)
    assert 0.0046 < a[-1] < 0.0048  # alphas_cumprod[-1] ~ 0.00466
    assert np.all(np.diff(a) < 0)


def test_add_noise_and_velocity_identities():
    s = schedulers.make_schedule()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (2, 4, 4, 3))
    n = jax.random.normal(k2, (2, 4, 4, 3))
    t = jnp.array([100, 900])
    noisy = schedulers.add_noise(s, x, n, t)
    # recover x0/eps from an epsilon prediction == the true pair
    x0, eps = schedulers.pred_to_x0_eps(s, n, noisy, t)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(n), rtol=1e-4,
                               atol=1e-5)
    # v-prediction consistency
    v = schedulers.get_velocity(s, x, n, t)
    s_v = schedulers.make_schedule(prediction_type="v_prediction")
    x0v, epsv = schedulers.pred_to_x0_eps(s_v, v, noisy, t)
    np.testing.assert_allclose(np.asarray(x0v), np.asarray(x), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(epsv), np.asarray(n), rtol=1e-3,
                               atol=1e-4)


def test_pndm_prev_sample_line_invariant():
    """The PLMS transfer keeps x on the (x0, eps) line: feeding the true
    eps moves sqrt(a_t)x0+sqrt(1-a_t)e to sqrt(a_p)x0+sqrt(1-a_p)e."""
    s = schedulers.make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))
    t, prev_t = jnp.array(801), jnp.array(701)
    a_t = s.alphas_cumprod[t]
    a_p = s.alphas_cumprod[prev_t]
    xt = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
    out = schedulers._pndm_prev_sample(s, xt, t, prev_t, eps)
    expect = jnp.sqrt(a_p) * x0 + jnp.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_pndm_full_chain_oracle():
    """Full PLMS chain (with warmup duplicate + multistep combos) under a
    constant-eps oracle lands on the final-alpha endpoint."""
    s = schedulers.make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 2))
    n = 10
    ts = schedulers.pndm_timesteps(s, n)
    assert len(ts) == n + 1 and ts[0] > ts[-1]
    ratio = s.num_train_timesteps // n
    xt = schedulers.add_noise(s, x0, eps, jnp.array([int(ts[0])]))
    state = schedulers.pndm_init_state(xt.shape)
    for t in ts:
        a = s.alphas_cumprod[int(t)]
        oracle = (xt - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        xt, state = schedulers.pndm_step(s, state, oracle, jnp.array(int(t)),
                                         xt, ratio)
    a0 = s.final_alpha_cumprod
    expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=5e-3, atol=5e-4)


def test_dpmpp_oracle_chain():
    """DPM-Solver++(2M) with a perfect eps-oracle preserves the (x0, eps)
    line; endpoint = alpha_f x0 + sigma_f eps (same invariant as DDIM)."""
    s = schedulers.make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 4, 2))
    n = 8
    ts = schedulers.dpmpp_timesteps(s, n)
    assert len(ts) == n and ts[0] > ts[-1]
    xt = schedulers.add_noise(s, x0, eps, jnp.array([int(ts[0])]))
    state = schedulers.dpmpp_init_state(xt.shape)
    for i, t in enumerate(ts):
        a = s.alphas_cumprod[int(t)]
        oracle = (xt - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        prev_t = int(ts[i + 1]) if i + 1 < n else -1
        xt, state = schedulers.dpmpp_step(s, state, oracle,
                                          jnp.array(int(t)), xt,
                                          jnp.array(prev_t))
    a0 = s.final_alpha_cumprod
    expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=5e-3, atol=5e-4)


def test_euler_oracle_recovers_x0():
    s = schedulers.make_schedule()
    sigmas = schedulers.euler_sigmas(s, 8)
    assert sigmas[-1] == 0.0 and sigmas[0] > sigmas[1]
    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 2))
    x = x0 + float(sigmas[0]) * eps
    for i in range(8):
        oracle = (x - x0) / float(sigmas[i])
        x = schedulers.euler_step(x, oracle, float(sigmas[i]),
                                  float(sigmas[i + 1]))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4,
                               atol=1e-5)


def test_karras_sigmas_shape_and_order():
    s = schedulers.make_schedule()
    sig, ts = schedulers.karras_sigmas(s, 10)
    assert sig.shape == (11,) and ts.shape == (10,)
    assert sig[-1] == 0.0 and np.all(np.diff(sig[:-1]) < 0)
    assert ts[0] > ts[-1] >= 0
    # oracle: euler over karras spacing still lands on x0
    x0 = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 4, 2))
    x = x0 + float(sig[0]) * eps
    for i in range(10):
        oracle = (x - x0) / float(sig[i])
        x = schedulers.euler_step(x, oracle, float(sig[i]), float(sig[i + 1]))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4,
                               atol=1e-5)


def test_ddim_deterministic_denoise():
    """DDIM with a perfect eps-oracle recovers x0 exactly in one step chain."""
    s = schedulers.make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2))
    ts = schedulers.ddim_timesteps(s, 10)
    assert ts[0] == 901 and ts[-1] == 1 and len(ts) == 10
    xt = schedulers.add_noise(s, x0, eps, jnp.array([ts[0]]))
    for t in ts:
        # oracle epsilon at every step: reconstruct exact noise toward x0
        a = s.alphas_cumprod[t]
        oracle_eps = (xt - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        xt = schedulers.ddim_step(s, oracle_eps, jnp.array([t]), xt,
                                  jnp.array([t - 100]))
    # with set_alpha_to_one=False the chain terminates at alphas_cumprod[0],
    # so the exact endpoint keeps a sqrt(1-a0)*eps residual (diffusers-equal)
    a0 = s.final_alpha_cumprod
    expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=1e-3, atol=1e-4)


def test_norm_stats_numerics():
    """Both norms keep the one-pass E[x]/E[x^2] form for producer fusion —
    DELIBERATELY (models/layers.py docstrings: a shifted group_norm cost
    ~14% of the training headline, two-pass layer_norm ~3%). The one-pass
    form cancels when var << mean^2, so verify both at the documented
    operating bound (|mean| ~ 1e2, std ~ 1 — transformer/conv activations)
    where f32 one-pass stats are still accurate."""
    from lora_tpu.models.layers import group_norm, layer_norm

    rng = np.random.default_rng(0)
    C = 64
    p = {"n.weight": jnp.ones((C,)), "n.bias": jnp.zeros((C,))}

    x2 = (rng.normal(0, 1.0, size=(2, C)) + 100.0).astype(np.float64)
    m = x2.mean(-1, keepdims=True)
    v = x2.var(-1, keepdims=True)
    want = (x2 - m) / np.sqrt(v + 1e-5)
    got2 = np.asarray(layer_norm(p, "n", jnp.asarray(x2, jnp.float32),
                                 eps=1e-5), np.float64)
    np.testing.assert_allclose(got2, want, atol=5e-2)

    base = (rng.normal(0, 1.0, size=(2, 4, 4, C)) + 100.0).astype(np.float64)

    def ref(x, groups):
        xg = x.reshape(2, -1, groups, C // groups)
        mg = xg.mean(axis=(1, 3), keepdims=True)
        vg = xg.var(axis=(1, 3), keepdims=True)
        return ((xg - mg) / np.sqrt(vg + 1e-5)).reshape(x.shape)

    got = np.asarray(group_norm(p, "n", jnp.asarray(base, jnp.float32),
                                groups=8, eps=1e-5), np.float64)
    np.testing.assert_allclose(got, ref(base, 8), atol=5e-2)
