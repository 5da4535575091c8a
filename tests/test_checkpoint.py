"""Full train-state checkpoint round-trip (optimizer moments preserved)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import init_lora
from lora_tpu.core.sites import Site
from lora_tpu.training.checkpoint import load_train_state, save_train_state
from lora_tpu.training.optim import make_optimizer

SITES = [Site("a.q", "linear", 8, 8), Site("b.k", "linear", 8, 8)]


def make_state(seed=0):
    trainable = {"lora_unet": init_lora(SITES, r=2,
                                        rng=jax.random.PRNGKey(seed))}
    opt = make_optimizer(trainable, {"lora_unet": 1e-3}, grad_accum=2)
    opt_state = opt.init(trainable)
    # take one update so moments are non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, trainable)
    _, opt_state = opt.update(grads, opt_state, trainable)
    return trainable, opt, opt_state


def test_roundtrip(tmp_path):
    trainable, opt, opt_state = make_state()
    rng = jax.random.PRNGKey(123)
    path = str(tmp_path / "state.safetensors")
    save_train_state(path, trainable, opt_state, 42, rng)

    t_like, _, s_like = make_state(seed=9)  # different values, same structure
    t2, s2, step, rng2 = load_train_state(path, t_like, s_like)
    assert step == 42
    np.testing.assert_array_equal(jax.random.key_data(rng),
                                  jax.random.key_data(rng2))
    for a, b in zip(jax.tree_util.tree_leaves(trainable),
                    jax.tree_util.tree_leaves(t2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_structure_mismatch_rejected(tmp_path):
    trainable, opt, opt_state = make_state()
    path = str(tmp_path / "state.safetensors")
    save_train_state(path, trainable, opt_state, 1, jax.random.PRNGKey(0))

    other = {"lora_unet": init_lora(SITES[:1], r=2,
                                    rng=jax.random.PRNGKey(0))}
    opt2 = make_optimizer(other, {"lora_unet": 1e-3}, grad_accum=2)
    with pytest.raises(ValueError):
        load_train_state(path, other, opt2.init(other))
