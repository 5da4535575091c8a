"""Persistent XLA compilation cache for CLI cold starts (ROADMAP #7).

First compiles of the big graphs (50-step CFG sampling loop, the train
step) cost minutes through a remote-compile path; caching them on disk
makes every later CLI invocation start warm. Enabled by every console
entry point; set LORA_TPU_COMPILE_CACHE=0 to disable or point it at a
custom directory.
"""

from __future__ import annotations

import os


def enable(default_dir: str = "~/.cache/lora_tpu/xla") -> str | None:
    val = os.environ.get("LORA_TPU_COMPILE_CACHE", "")
    if val == "0":
        return None
    cache_dir = os.path.expanduser(val or default_dir)
    try:
        import jax

        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current:  # already configured (e.g. tests/conftest.py) — keep it
            return current
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return cache_dir
    except Exception:
        return None
