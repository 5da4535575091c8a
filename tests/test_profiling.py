"""Profiling utilities smoke test."""

import glob
import os

import jax
import jax.numpy as jnp

from lora_tpu.utils.profiling import annotate, memory_stats, timed, trace


def test_trace_writes_artifacts(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("matmul"):
            x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
            jax.block_until_ready(x)
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert files, "trace produced no artifacts"


def test_timed_and_memory(capsys):
    with timed("noop"):
        pass
    out = capsys.readouterr().out
    assert "noop" in out
    assert isinstance(memory_stats(), dict)
