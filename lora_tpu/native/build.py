"""On-demand build + loader for the native extensions.

`get_imgops()` returns the compiled `_lora_imgops` module, building it with
cc the first time (cached next to the source); returns None when no
toolchain is available so every caller has a pure-Python fallback.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imgops.c")
_SO = os.path.join(_DIR, "_lora_imgops.so")

_cached = None
_failed = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CC", "cc"), "-O3", "-shared", "-fPIC", "-pthread",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"[lora_tpu.native] build skipped: {e}")
        return False


def get_imgops() -> Optional[object]:
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    needs_build = (not os.path.exists(_SO)
                   or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if needs_build and not _build():
        _failed = True
        return None
    try:
        spec = importlib.util.spec_from_file_location("_lora_imgops", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
        return mod
    except Exception as e:  # corrupt build, ABI mismatch, ...
        print(f"[lora_tpu.native] load failed: {e}")
        _failed = True
        return None
