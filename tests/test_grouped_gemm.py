"""Pallas grouped GEMM (gemm_grouped.py) vs lax.ragged_dot / dequant
oracles, and the fused_moe pallas backend vs the XLA path.

Reference analogue: tests/moe/ grouped-GEMM coverage; the in-kernel fp8
dequant mirrors the CUTLASS mainloop dequant
(csrc/fused_moe/cutlass_backend/cutlass_fused_moe_kernels.cuh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.fp8 import e4m3_bits_to_bf16
from flashinfer_tpu.ops.fused_moe import fused_moe, route_tokens
from flashinfer_tpu.ops.gemm_grouped import (
    fp8_k_permutation,
    grouped_gemm,
    make_group_layout,
)


def _quant_e4m3(w, scales):
    """per-expert e4m3 quantization -> (int8 bits, exact bf16 dequant)."""
    bits = jnp.asarray(
        (w / scales[:, None, None]).astype(np.dtype("float8_e4m3fn"))
    )
    bits_i8 = jax.lax.bitcast_convert_type(bits, jnp.int8)
    deq = (
        np.asarray(e4m3_bits_to_bf16(bits_i8).astype(jnp.float32))
        * scales[:, None, None]
    )
    return bits_i8, deq


@pytest.mark.parametrize(
    "gs",
    [
        [70, 0, 130, 56],  # uneven + empty group
        [256, 0, 0, 0],  # everything in one group
        [1, 1, 1, 1],  # tiny groups (pure padding tiles)
    ],
)
def test_grouped_gemm_bf16_vs_ragged_dot(gs):
    rng = np.random.default_rng(0)
    E, K, N = 4, 256, 384
    gs = np.asarray(gs, np.int32)
    M = int(gs.sum())
    lhs = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((E, K, N)), jnp.bfloat16)
    out = grouped_gemm(lhs, rhs, jnp.asarray(gs), tm=128, interpret=True)
    ref = jax.lax.ragged_dot(
        lhs, rhs, jnp.asarray(gs), preferred_element_type=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-1,
    )


def test_grouped_gemm_fp8_in_kernel_dequant():
    rng = np.random.default_rng(1)
    E, K, N = 4, 256, 384
    gs = np.array([100, 28, 0, 128], np.int32)
    M = int(gs.sum())
    lhs = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = rng.standard_normal((E, K, N)).astype(np.float32) * 0.1
    scales = np.array([0.2, 0.31, 0.15, 0.27], np.float32)
    bits, deq = _quant_e4m3(w, scales)
    out = grouped_gemm(
        lhs, bits, jnp.asarray(gs), jnp.asarray(scales), tm=128,
        interpret=True,
    )
    ref = jax.lax.ragged_dot(
        lhs, jnp.asarray(deq, jnp.bfloat16), jnp.asarray(gs),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=5e-2,
    )


def test_group_layout_roundtrip():
    """padded_pos / src_row must invert each other on real rows."""
    gs = jnp.asarray([5, 0, 131, 12], jnp.int32)
    lay = make_group_layout(gs, 148, tm=64)
    pos = np.asarray(lay.padded_pos)
    src = np.asarray(lay.src_row)
    valid = np.asarray(lay.src_valid)
    assert valid[pos].all()
    np.testing.assert_array_equal(src[pos], np.arange(148))
    # exactly num_rows real slots
    assert int(valid.sum()) == 148
    # every used tile belongs to the right expert
    eot = np.asarray(lay.expert_of_tile)
    for t, e in enumerate(eot):
        if e < 0:
            assert not valid[t * 64 : (t + 1) * 64].any()


def test_fp8_k_permutation_halves():
    p = fp8_k_permutation(16, 8)
    np.testing.assert_array_equal(
        p, [0, 2, 4, 6, 1, 3, 5, 7, 8, 10, 12, 14, 9, 11, 13, 15]
    )


def _moe_inputs(rng, m, e, hidden, inter, top_k, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((m, hidden)), dtype)
    w13 = jnp.asarray(
        rng.standard_normal((e, 2 * inter, hidden)) * 0.1, dtype
    )
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)) * 0.1, dtype)
    logits = jnp.asarray(rng.standard_normal((m, e)), jnp.float32)
    ids, scales = route_tokens(logits, top_k)
    return x, w13, w2, ids, scales


def test_fused_moe_pallas_matches_xla():
    rng = np.random.default_rng(2)
    m, e, hidden, inter, top_k = 32, 4, 128, 256, 2
    x, w13, w2, ids, scales = _moe_inputs(rng, m, e, hidden, inter, top_k)
    out_p = fused_moe(
        x, w13, w2, ids, scales, backend="pallas", interpret=True
    )
    out_x = fused_moe(x, w13, w2, ids, scales, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_fused_moe_pallas_fp8_weights():
    """fp8 expert weights through the in-kernel dequant — never a bf16
    weight copy — must match the XLA materialize-then-ragged_dot path."""
    rng = np.random.default_rng(3)
    m, e, hidden, inter, top_k = 24, 4, 128, 256, 2
    x = jnp.asarray(rng.standard_normal((m, hidden)), jnp.bfloat16)
    w13f = rng.standard_normal((e, 2 * inter, hidden)).astype(np.float32) * 0.1
    w2f = rng.standard_normal((e, hidden, inter)).astype(np.float32) * 0.1
    s13 = np.full(e, 0.02, np.float32)
    s2 = np.full(e, 0.02, np.float32)
    b13, _ = _quant_e4m3(w13f, s13)
    b2, _ = _quant_e4m3(w2f, s2)
    logits = jnp.asarray(rng.standard_normal((m, e)), jnp.float32)
    ids, scales = route_tokens(logits, top_k)
    out_p = fused_moe(
        x, b13, b2, ids, scales,
        w13_scale=jnp.asarray(s13), w2_scale=jnp.asarray(s2),
        backend="pallas", interpret=True, out_dtype=jnp.bfloat16,
    )
    out_x = fused_moe(
        x, b13, b2, ids, scales,
        w13_scale=jnp.asarray(s13), w2_scale=jnp.asarray(s2),
        backend="xla", out_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_fused_moe_weights_kn_layout():
    """Engines store weights pre-transposed [E, K, N]; results must match
    the reference-layout call."""
    rng = np.random.default_rng(4)
    m, e, hidden, inter, top_k = 16, 4, 128, 256, 2
    x, w13, w2, ids, scales = _moe_inputs(rng, m, e, hidden, inter, top_k)
    out_ref = fused_moe(
        x, w13, w2, ids, scales, backend="pallas", interpret=True
    )
    out_kn = fused_moe(
        x, jnp.swapaxes(w13, 1, 2), jnp.swapaxes(w2, 1, 2), ids, scales,
        backend="pallas", interpret=True, weights_kn=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_kn, np.float32), np.asarray(out_ref, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_fused_moe_pallas_under_jit():
    """Traced group sizes: one compiled program serves any routing."""
    rng = np.random.default_rng(5)
    m, e, hidden, inter, top_k = 16, 4, 128, 128, 2
    x, w13, w2, ids, scales = _moe_inputs(rng, m, e, hidden, inter, top_k)

    @jax.jit
    def f(x, ids, scales):
        return fused_moe(
            x, w13, w2, ids, scales, backend="pallas", interpret=True
        )

    out_j = f(x, ids, scales)
    out_e = fused_moe(x, w13, w2, ids, scales, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out_j, np.float32), np.asarray(out_e, np.float32),
        rtol=5e-2, atol=5e-2,
    )
