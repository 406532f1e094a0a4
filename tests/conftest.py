"""Test harness: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy (SURVEY.md §4): oracle-vs-kernel
comparisons, with Pallas kernels in interpret mode on CPU (reference's
BASELINE config 1) and multi-chip tests over a virtual host mesh instead of
a real slice.
"""

import os

# Must run before the first jax backend init. The environment's
# sitecustomize registers the axon TPU tunnel and sets the *config*
# jax_platforms="axon,cpu" (which outranks the env var) — override the
# config itself, or every test op round-trips through the remote TPU relay.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# XLA CPU runs f32 dots at reduced precision by default (~bf16 mantissa),
# which swamps kernel-vs-oracle tolerances; force exact f32 in tests.
jax.config.update("jax_default_matmul_precision", "highest")

# Single-core CI box: persistent compile cache cuts re-runs dramatically.
# The dir is keyed on the host CPU's feature flags: XLA:CPU AOT cache
# entries embed machine features, and loading entries written on a
# different host SEGFAULTS deep in cache deserialization (observed when
# the CI box changed between rounds — "machine features don't match ...
# could lead to SIGILL" warnings, then a segfault in
# compilation_cache.put_executable_and_time).
import hashlib

_cpu_flags = ""
try:
    for _line in open("/proc/cpuinfo"):
        if _line.startswith("flags"):
            _cpu_flags = _line
            break
except OSError:
    pass
_tag = hashlib.md5(_cpu_flags.encode()).hexdigest()[:8]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# NOTE: do NOT set jax_persistent_cache_enable_xla_caches="all" here. The
# XLA:CPU AOT side caches embed host machine features (SIGILL on a
# different box) and their serialization hung/segfaulted the suite inside
# compilation_cache.put_executable_and_time (observed r4: three runs stuck
# 30+ min at the same frame; the same tests pass in seconds without it).


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
