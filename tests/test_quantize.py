"""Int8 base-weight quantization: memory halves, outputs stay close, LoRA
still applies at full precision."""

import jax
import jax.numpy as jnp
import numpy as np

from lora_tpu.core.lora import init_lora
from lora_tpu.core.quantize import quantize_params_int8
from lora_tpu.core.sites import unet_lora_sites
from lora_tpu.models.config import TINY_UNET
from lora_tpu.models.unet import init_unet, unet_forward


def test_quantize_roundtrip_accuracy():
    from lora_tpu.core.quantize import dequantize_weight

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.2
    p = quantize_params_int8({"a.weight": w})
    assert p["a.weight"].dtype == jnp.int8
    wd = dequantize_weight(p, "a.weight", jnp.float32)
    rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # per-channel int8: <1% of channel max


def test_norms_and_biases_not_quantized():
    p = {"x.norm1.weight": jnp.ones((8,)),
         "x.conv1.weight": jnp.ones((8, 4, 3, 3)),
         "x.conv1.bias": jnp.ones((8,)),
         "emb.token_embedding.weight": jnp.ones((10, 8))}
    q = quantize_params_int8(p)
    assert q["x.norm1.weight"].dtype != jnp.int8
    assert q["x.conv1.weight"].dtype == jnp.int8
    assert q["x.conv1.bias"].dtype != jnp.int8
    assert q["emb.token_embedding.weight"].dtype != jnp.int8


def test_unet_forward_int8_close_and_lora_applies():
    params = init_unet(TINY_UNET, jax.random.PRNGKey(0))
    qparams = quantize_params_int8(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t = jnp.array([500])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 7, TINY_UNET.cross_attention_dim))
    ref = np.asarray(unet_forward(params, x, t, ctx, TINY_UNET))
    q8 = np.asarray(unet_forward(qparams, x, t, ctx, TINY_UNET))
    # int8 base: small relative deviation on the output
    denom = np.abs(ref).max()
    assert np.abs(q8 - ref).max() / denom < 0.15
    assert np.abs(q8 - ref).mean() / denom < 0.02

    # LoRA delta rides on top at full precision
    lora = init_lora(unet_lora_sites(TINY_UNET), r=2,
                     rng=jax.random.PRNGKey(3))
    ks = jax.random.split(jax.random.PRNGKey(4), len(lora["sites"]))
    for (n, e), k in zip(sorted(lora["sites"].items()), ks):
        e["up"] = jax.random.normal(k, e["up"].shape) * 0.05
    with_lora = np.asarray(unet_forward(qparams, x, t, ctx, TINY_UNET,
                                        lora=lora))
    assert np.abs(with_lora - q8).max() > 1e-4


def test_memory_halves():
    params = init_unet(TINY_UNET, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    q = quantize_params_int8(params)

    def nbytes(d):
        return sum(np.asarray(v).nbytes for v in d.values())

    assert nbytes(q) < 0.7 * nbytes(params)


def test_int8_matmul_kernel_matches_dequant():
    """Pallas dequant-inside-matmul == XLA dequantize-then-matmul, including
    non-128-aligned M/N/K (SD dims like 320) via internal padding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lora_tpu.core.quantize import quantize_params_int8
    from lora_tpu.ops.int8_matmul import int8_matmul

    rs = np.random.RandomState(0)
    for M, N, K in ((100, 320, 320), (256, 512, 1280), (7, 77, 64)):
        w = jnp.asarray(rs.randn(N, K).astype(np.float32) * 0.05)
        q = quantize_params_int8({"lin.weight": w})
        x = jnp.asarray(rs.randn(2, M, K).astype(np.float32))
        got = int8_matmul(x, q["lin.weight"], q["lin.weight_scale"])
        want = x @ (q["lin.weight"].astype(jnp.float32)
                    * q["lin.weight_scale"][:, None]).T
        assert got.shape == (2, M, N)
        # kernel casts inputs to bf16 for the MXU; the reference keeps f32,
        # so tolerance = bf16 rounding over a K-term accumulation
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
