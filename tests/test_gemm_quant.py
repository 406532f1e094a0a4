"""GEMM + quantization tests (reference: tests/GEMM/, tests/utils/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.fp4 import (
    e2m1_to_float,
    fp4_dequantize,
    fp4_quantize,
    mxfp4_dequantize,
    mxfp4_quantize,
)
from flashinfer_tpu.ops.fp8 import (
    fp8_quantize_rowwise,
    mxfp8_dequantize,
    mxfp8_quantize,
)
from flashinfer_tpu.ops.gemm import (
    SegmentGEMMWrapper,
    bmm_fp8,
    gemm_fp8_nt_groupwise,
    group_gemm_fp8_nt_groupwise,
    mm_fp4,
    tgv_gemm,
)


def test_mxfp8_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32) * 10
    q, sf = mxfp8_quantize(jnp.asarray(x))
    assert q.dtype == jnp.float8_e4m3fn and sf.shape == (4, 2)
    x_rt = np.asarray(mxfp8_dequantize(q, sf))
    # e4m3 has ~2 decimal digits; block scale adds none
    np.testing.assert_allclose(x_rt, x, rtol=0.13, atol=0.3)


def test_fp8_rowwise_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32)).astype(np.float32)
    q, s = fp8_quantize_rowwise(jnp.asarray(x))
    x_rt = np.asarray(q.astype(jnp.float32)) * np.asarray(s)[:, None]
    np.testing.assert_allclose(x_rt, x, rtol=0.13, atol=0.05)


def test_fp4_quantize_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    packed, sf = fp4_quantize(jnp.asarray(x), sf_vec_size=16)
    assert packed.shape == (4, 16) and sf.shape == (4, 2)
    x_rt = np.asarray(fp4_dequantize(packed, sf, sf_vec_size=16))
    # e2m1: very coarse — check correlation & scale rather than tight error
    err = np.abs(x_rt - x) / (np.abs(x).max())
    assert err.mean() < 0.2, err.mean()


def test_mxfp4_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64)).astype(np.float32) * 3
    packed, sf = mxfp4_quantize(jnp.asarray(x))
    x_rt = np.asarray(mxfp4_dequantize(packed, sf))
    err = np.abs(x_rt - x) / np.abs(x).max()
    assert err.mean() < 0.2


def test_e2m1_codes():
    want = [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]
    got = np.asarray(e2m1_to_float(jnp.arange(8)))
    np.testing.assert_array_equal(got, want)
    got_neg = np.asarray(e2m1_to_float(jnp.arange(8, 16)))
    np.testing.assert_array_equal(got_neg, [-v for v in want])


def test_segment_gemm():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((10, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 16, 8)), jnp.float32)
    seg_lens = jnp.asarray([3, 0, 7])
    out = SegmentGEMMWrapper().run(x, w, 3, False, seg_lens=seg_lens)
    want0 = np.asarray(x[:3]) @ np.asarray(w[0])
    want2 = np.asarray(x[3:]) @ np.asarray(w[2])
    np.testing.assert_allclose(np.asarray(out[:3]), want0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[3:]), want2, rtol=2e-4, atol=2e-4)


def test_segment_gemm_weight_indices_column_major():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)  # [n, k] cm
    out = SegmentGEMMWrapper().run(
        x, w, 2, True, seg_indptr=jnp.asarray([0, 2, 5]),
        weight_indices=jnp.asarray([1, 0]),
    )
    np.testing.assert_allclose(
        np.asarray(out[:2]), np.asarray(x[:2]) @ np.asarray(w[1]).T,
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out[2:]), np.asarray(x[2:]) @ np.asarray(w[0]).T,
        rtol=2e-4, atol=2e-4,
    )


def test_bmm_fp8():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((2, 4, 16)).astype(np.float32)
    b = rng.standard_normal((2, 16, 8)).astype(np.float32)
    a8 = jnp.asarray(a, jnp.float8_e4m3fn)
    b8 = jnp.asarray(b, jnp.float8_e4m3fn)
    out = bmm_fp8(a8, b8, jnp.asarray(2.0), jnp.asarray(0.5))
    want = (
        np.asarray(a8.astype(jnp.float32)) @ np.asarray(b8.astype(jnp.float32))
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), want, rtol=0.05, atol=0.1
    )


def test_gemm_fp8_nt_groupwise_matches_dequant():
    rng = np.random.default_rng(7)
    m, n, k = 32, 128, 256
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((n, k)).astype(np.float32)
    a8 = jnp.asarray(a, jnp.float8_e4m3fn)
    b8 = jnp.asarray(b, jnp.float8_e4m3fn)
    a_scale = jnp.asarray(rng.uniform(0.5, 2.0, (m, k // 128)), jnp.float32)
    b_scale = jnp.asarray(rng.uniform(0.5, 2.0, (k // 128, n // 128)), jnp.float32)
    out = gemm_fp8_nt_groupwise(a8, b8, a_scale, b_scale, block_m=32,
                                block_n=128, interpret=True)
    # dequant oracle
    a_f = np.asarray(a8.astype(jnp.float32)).reshape(m, k // 128, 128)
    a_f = (a_f * np.asarray(a_scale)[:, :, None]).reshape(m, k)
    b_f = np.asarray(b8.astype(jnp.float32)).reshape(n, k // 128, 128)
    bs = np.repeat(np.asarray(b_scale), 128, axis=1)[:, :n]  # [k/128, n]
    b_f = b_f * bs.T.reshape(n, k // 128, 1)
    b_f = b_f.reshape(n, k)
    want = a_f @ b_f.T
    np.testing.assert_allclose(np.asarray(out, np.float32), want, rtol=0.02,
                               atol=0.5)


def test_group_gemm_fp8_nt_groupwise():
    rng = np.random.default_rng(8)
    g, n, k = 2, 64, 256
    m_sizes = [5, 11]
    total_m = sum(m_sizes)
    a = jnp.asarray(rng.standard_normal((total_m, k)), jnp.float8_e4m3fn)
    b = jnp.asarray(rng.standard_normal((g, n, k)), jnp.float8_e4m3fn)
    a_scale = jnp.asarray(rng.uniform(0.5, 2, (total_m, k // 128)), jnp.float32)
    # n-block scale granularity 128 -> ceil(64/128) = 1 block
    b_scale = jnp.asarray(rng.uniform(0.5, 2, (g, k // 128, 1)), jnp.float32)
    m_indptr = jnp.asarray([0, 5, 16])
    out = group_gemm_fp8_nt_groupwise(a, b, a_scale, b_scale, m_indptr)
    # oracle
    a_f = np.asarray(a.astype(jnp.float32)).reshape(total_m, k // 128, 128)
    a_f = (a_f * np.asarray(a_scale)[:, :, None]).reshape(total_m, k)
    for gi, (lo, hi) in enumerate([(0, 5), (5, 16)]):
        b_f = np.asarray(b[gi].astype(jnp.float32)).reshape(n, k // 128, 128)
        bs = np.repeat(np.asarray(b_scale[gi]), 64, axis=1)[:, :n]
        b_f = (b_f * bs.T.reshape(n, k // 128, 1)).reshape(n, k)
        want = a_f[lo:hi] @ b_f.T
        np.testing.assert_allclose(
            np.asarray(out[lo:hi], np.float32), want, rtol=0.05, atol=1.0
        )


def test_mm_fp4():
    rng = np.random.default_rng(9)
    m, n, k = 8, 16, 32
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((n, k)).astype(np.float32)
    a_q, a_sf = fp4_quantize(jnp.asarray(a))
    b_q, b_sf = fp4_quantize(jnp.asarray(b))
    out = np.asarray(mm_fp4(a_q, b_q, a_sf, b_sf), np.float32)
    a_rt = np.asarray(fp4_dequantize(a_q, a_sf))
    b_rt = np.asarray(fp4_dequantize(b_q, b_sf))
    np.testing.assert_allclose(out, a_rt @ b_rt.T, rtol=0.02, atol=0.2)


def test_tgv_gemm_bias():
    rng = np.random.default_rng(10)
    a = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    out = tgv_gemm(a, b, bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(a) @ np.asarray(b) + np.asarray(bias),
        rtol=2e-4, atol=2e-4,
    )
