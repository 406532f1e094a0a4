"""Native-code JIT layer (host-side C++ runtime build/cache/load).

See core.py. Device kernels need no JIT here: Pallas kernels are traced
Python compiled by XLA (with the persistent compilation cache standing in
for the reference's AOT cubin cache).
"""

from flashinfer_tpu.jit.core import (
    JitSpec,
    build_and_load,
    clear_cache,
    get_native_runtime,
    jit_registry,
)
from flashinfer_tpu.jit.env import CACHE_DIR, logger

__all__ = [
    "JitSpec",
    "build_and_load",
    "clear_cache",
    "get_native_runtime",
    "jit_registry",
    "CACHE_DIR",
    "logger",
]
