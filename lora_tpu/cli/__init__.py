"""Console entry points. Importing the package turns on the persistent XLA
compilation cache so repeat CLI invocations skip the big cold compiles
(utils/compile_cache.py; opt out with LORA_TPU_COMPILE_CACHE=0)."""

from ..utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
