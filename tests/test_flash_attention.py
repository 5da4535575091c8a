"""Flash attention kernel vs the XLA reference path (interpret mode on CPU,
compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.ops.attention import _xla_attention
from lora_tpu.ops.flash_attention import flash_attention, supported


def make_qkv(B=1, H=2, T=256, S=512, D=40, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, T, D), dtype)
    k = jax.random.normal(ks[1], (B, H, S, D), dtype)
    v = jax.random.normal(ks[2], (B, H, S, D), dtype)
    return q, k, v


def test_supported_shapes():
    assert supported((1, 8, 4096, 40), (1, 8, 4096, 40))
    assert supported((1, 8, 1024, 80), (1, 8, 1024, 80))
    assert supported((1, 8, 256, 160), (1, 8, 256, 160))
    assert not supported((1, 8, 64, 160), (1, 8, 64, 160))
    assert not supported((1, 8, 256, 160), (1, 8, 77, 160))


def test_flash_matches_xla():
    q, k, v = make_qkv()
    scale = q.shape[-1] ** -0.5
    ref = _xla_attention(q, k, v, scale, None)
    out = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-4)


def test_flash_headdim_not_multiple_of_128():
    # D=40 (SD 320-channel heads): padding path
    q, k, v = make_qkv(T=256, S=256, D=40, seed=3)
    scale = 0.2
    ref = _xla_attention(q, k, v, scale, None)
    out = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-4)


def test_flash_grads_match_xla():
    q, k, v = make_qkv(T=256, S=256, D=32, seed=5)
    scale = q.shape[-1] ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale, None) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)


def test_flash_xl_headdim_fwd_bwd():
    # D=64 (SDXL 10/20-head blocks): fwd + grads at the XL head dim
    q, k, v = make_qkv(T=256, S=256, D=64, seed=7)
    scale = 64 ** -0.5
    ref = _xla_attention(q, k, v, scale, None)
    out = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-4)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale, None) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="compiles the real kernels; TPU lane only")
def test_flash_f32_full_size_fits_vmem():
    """f32 q/k/v at the UNet's largest attention level (T=4096, D=40) must
    compile and run — regression for the scoped-VMEM overflow the full-T
    f32 blocks used to cause in the dK/dV kernel (fixed by the streaming
    3D-grid + scratch-accumulator structure)."""
    q, k, v = make_qkv(B=1, H=8, T=4096, S=4096, D=40, seed=9)
    scale = 40 ** -0.5

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="compiles the real kernels; TPU lane only")
def test_flash_768px_level_grads():
    """The 768px top attention level (96x96 latents -> T=S=9216, a
    non-power-of-two multiple of BQ) must run fwd+bwd through the flash
    kernels; smaller 768px levels (576, 144) are rejected by supported()
    and take the XLA path, so together every resolution the trainers
    accept compiles."""
    assert supported((1, 8, 9216, 40), (1, 8, 9216, 40))
    assert not supported((1, 8, 576, 40), (1, 8, 576, 40))
    q, k, v = make_qkv(B=1, H=8, T=9216, S=9216, D=40, seed=3,
                       dtype=jnp.bfloat16)
    scale = 40 ** -0.5

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x, dtype=np.float32)).all() for x in g)
