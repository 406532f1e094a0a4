"""Testing & benchmarking utilities (reference flashinfer/testing/)."""

from flashinfer_tpu.testing.utils import (
    assert_close_with_mismatch_tolerance,
    attention_flops,
    attention_tb_per_sec,
    attention_tflops_per_sec,
    bench_tpu_time,
    bench_tpu_time_differential,
    gemm_flops,
    quantize_fp8_rowwise_ref,
)

__all__ = [
    "assert_close_with_mismatch_tolerance",
    "attention_flops",
    "attention_tb_per_sec",
    "attention_tflops_per_sec",
    "bench_tpu_time",
    "bench_tpu_time_differential",
    "gemm_flops",
    "quantize_fp8_rowwise_ref",
]
