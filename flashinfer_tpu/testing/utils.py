"""Benchmark timing harnesses + analytic flops/bandwidth calculators.

Reference parity: flashinfer/testing/utils.py —
  * ``attention_flops`` (:256), ``attention_tflops_per_sec`` (:332),
    ``attention_tb_per_sec`` (:444): analytic achieved-rate calculators.
  * timing harnesses ``bench_gpu_time_with_cuda_event`` (:538) /
    ``bench_gpu_time_with_cudagraph`` (:855): on TPU these map to
    ``bench_tpu_time`` (block_until_ready wall timing) and
    ``bench_tpu_time_differential`` (scan-replay differential timing, the
    analogue of CUDA-graph replay batching — it cancels the multi-ms
    dispatch latency of remote/tunneled devices).
  * ``assert_close_with_mismatch_tolerance``
    (tests/test_helpers/test_helpers.py:37).
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = [
    "attention_flops",
    "attention_tflops_per_sec",
    "attention_bytes",
    "attention_tb_per_sec",
    "gemm_flops",
    "bench_tpu_time",
    "bench_tpu_time_differential",
    "assert_close_with_mismatch_tolerance",
    "quantize_fp8_rowwise_ref",
]


# --------------------------------------------------------------------------
# analytic calculators


def attention_flops(
    batch_size: int,
    qo_len: int,
    kv_len: int,
    head_dim_qk: int,
    head_dim_vo: int,
    num_qo_heads: int,
    causal: bool = False,
) -> float:
    """Total attention FLOPs (2 matmuls; causal halves the visible area).
    Reference: testing/utils.py:256."""
    if causal:
        # rows attend to (kv_len - qo_len + i + 1) keys
        area = qo_len * (kv_len - qo_len) + qo_len * (qo_len + 1) / 2
    else:
        area = qo_len * kv_len
    per_head = 2 * area * head_dim_qk + 2 * area * head_dim_vo
    return batch_size * num_qo_heads * per_head


def attention_tflops_per_sec(seconds: float, **kw) -> float:
    return attention_flops(**kw) / seconds / 1e12


def attention_bytes(
    batch_size: int,
    qo_len: int,
    kv_len: int,
    head_dim_qk: int,
    head_dim_vo: int,
    num_qo_heads: int,
    num_kv_heads: int,
    q_itemsize: int = 2,
    kv_itemsize: int = 2,
    o_itemsize: int = 2,
) -> float:
    """Minimum HBM traffic: read q + kv once, write o once."""
    q = batch_size * qo_len * num_qo_heads * head_dim_qk * q_itemsize
    kv = (
        batch_size
        * kv_len
        * num_kv_heads
        * (head_dim_qk + head_dim_vo)
        * kv_itemsize
    )
    o = batch_size * qo_len * num_qo_heads * head_dim_vo * o_itemsize
    return q + kv + o


def attention_tb_per_sec(seconds: float, **kw) -> float:
    """Achieved TB/s against the minimal-traffic model
    (reference testing/utils.py:444)."""
    return attention_bytes(**kw) / seconds / 1e12


def gemm_flops(m: int, n: int, k: int, batch: int = 1) -> float:
    return 2.0 * batch * m * n * k


# --------------------------------------------------------------------------
# timing harnesses


def bench_tpu_time(
    fn: Callable,
    *args,
    warmup: int = 3,
    repeats: int = 10,
    reducer: str = "median",
) -> float:
    """Wall-time one call (block_until_ready), seconds. Fine on directly
    attached devices; on tunneled devices prefer the differential bencher."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(getattr(np, reducer)(times))


def bench_tpu_time_differential(
    step: Callable,
    carry0,
    *invariants,
    n_short: int = 4,
    n_long: int = 20,
    repeats: int = 5,
) -> float:
    """Per-iteration device time of ``step`` (seconds), measured as
    (T(n_long) - T(n_short)) / (n_long - n_short) over a lax.scan — the TPU
    analogue of CUDA-graph replay timing (reference testing/utils.py:855).

    step(carry, *invariants) -> carry must chain a data dependency through
    ``carry`` so scan iterations serialize. ``invariants`` are passed as jit
    arguments (never closure-capture large arrays: they would be baked into
    the HLO as constants).
    """
    import jax

    def make(n):
        return jax.jit(
            lambda c, *inv: jax.lax.scan(
                lambda cc, _: (step(cc, *inv), ()), c, None, length=n
            )[0]
        )

    def timed(f):
        y = f(carry0, *invariants)
        jax.block_until_ready(y)
        np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            y = f(carry0, *invariants)
            np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    t_short = timed(make(n_short))
    t_long = timed(make(n_long))
    return max((t_long - t_short) / (n_long - n_short), 1e-9)


# --------------------------------------------------------------------------
# comparison helpers


def assert_close_with_mismatch_tolerance(
    actual,
    desired,
    rtol: float = 1e-5,
    atol: float = 1e-8,
    max_mismatched_elements: int = 0,
):
    """allclose that tolerates a bounded count of outlier elements
    (reference tests/test_helpers/test_helpers.py:37 — used for kernels with
    benign tie-break/rounding divergence)."""
    actual = np.asarray(actual, np.float64)
    desired = np.asarray(desired, np.float64)
    bad = ~np.isclose(actual, desired, rtol=rtol, atol=atol, equal_nan=True)
    n_bad = int(bad.sum())
    if n_bad > max_mismatched_elements:
        idx = np.argwhere(bad)[:10]
        raise AssertionError(
            f"{n_bad} mismatched elements (> {max_mismatched_elements} "
            f"allowed) at rtol={rtol}, atol={atol}; first bad indices: "
            f"{idx.tolist()}; actual={actual[bad][:10]}, "
            f"desired={desired[bad][:10]}"
        )


def quantize_fp8_rowwise_ref(x: np.ndarray):
    """NumPy fp8-e4m3 rowwise quantization oracle (reference
    testing/utils.py:66 quantize_fp8 helpers)."""
    import ml_dtypes

    amax = np.abs(x).max(axis=-1, keepdims=True)
    scale = np.where(amax > 0, amax / 448.0, 1.0)
    q = (x / scale).astype(ml_dtypes.float8_e4m3fn)
    return q, scale.astype(np.float32)
