"""Full training-state checkpointing (trainable + optimizer state + step +
PRNG key) — resume capability the reference lacks (it reloads adapter
weights only and loses Adam moments, SURVEY §5).

Format: one safetensors file; leaves stored in tree-flatten order as
"leaf:{i}", the PRNG key as raw key data, step in metadata. Restore requires
a structurally identical `like` state (rebuild trainable + optimizer from
the same config, then load), which keeps arbitrary optax state nodes
(namedtuples, MultiSteps) out of the serialization format.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.reader import SafetensorsFile, save_file


def _key_data(rng):
    try:
        return np.asarray(jax.random.key_data(rng))
    except TypeError:  # already raw uint32
        return np.asarray(rng)


def save_train_state(path: str, trainable: Any, opt_state: Any, step: int,
                     rng: jax.Array) -> None:
    state = {"trainable": trainable, "opt_state": opt_state}
    leaves = jax.tree_util.tree_leaves(state)
    tensors = {f"leaf:{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tensors["__rng__"] = _key_data(rng)
    save_file(tensors, path, {"step": str(step),
                              "n_leaves": str(len(leaves))})


def load_train_state(path: str, trainable_like: Any,
                     opt_state_like: Any) -> Tuple[Any, Any, int, jax.Array]:
    """Restore into the structure of the provided templates."""
    like = {"trainable": trainable_like, "opt_state": opt_state_like}
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    with SafetensorsFile(path) as f:
        meta = f.metadata()
        n = int(meta["n_leaves"])
        if n != len(flat_like):
            raise ValueError(
                f"checkpoint has {n} leaves, expected {len(flat_like)} — "
                "was the optimizer/trainable config changed?")
        leaves = []
        for i, tmpl in enumerate(flat_like):
            arr = f.get_tensor(f"leaf:{i}")
            tshape = tuple(np.shape(tmpl))
            if tuple(arr.shape) != tshape:
                raise ValueError(
                    f"leaf {i} shape {arr.shape} != expected {tshape}")
            leaves.append(jnp.asarray(arr).astype(np.asarray(tmpl).dtype))
        step = int(meta["step"])
        rng = jax.random.wrap_key_data(
            jnp.asarray(f.get_tensor("__rng__")))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state["trainable"], state["opt_state"], step, rng


class PreemptionGuard:
    """Graceful-preemption handling (SIGTERM — what TPU VM maintenance and
    cluster schedulers deliver): installs a handler that only sets a flag;
    the training loop polls `should_stop` once per step, checkpoints the
    full train state, and returns cleanly. The reference has no preemption
    story (SURVEY §5: no retry, no preemption handling).

    Use as a context manager; installation is skipped (should_stop stays
    False) when not in the main thread, where CPython forbids signal().
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = (signals if signals is not None
                        else (_signal.SIGTERM,))
        self.should_stop = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.should_stop = True

    def __enter__(self):
        try:
            for s in self.signals:
                self._prev[s] = self._signal.signal(s, self._handler)
        except ValueError:  # not the main thread
            self._prev = {}
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            self._signal.signal(s, h)
        return False
