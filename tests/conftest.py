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
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
