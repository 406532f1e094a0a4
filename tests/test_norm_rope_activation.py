"""norm / rope / activation / packbits tests (reference: tests/utils/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.activation import gelu_and_mul, gelu_tanh_and_mul, silu_and_mul
from flashinfer_tpu.ops.norm import (
    fused_add_rmsnorm,
    gemma_fused_add_rmsnorm,
    gemma_rmsnorm,
    rmsnorm,
    rmsnorm_pallas,
)
from flashinfer_tpu.ops.quantization import packbits, segment_packbits, unpackbits
from flashinfer_tpu.ops.rope import (
    apply_llama31_rope_pos_ids,
    apply_rope,
    apply_rope_pos_ids,
    apply_rope_with_cos_sin_cache,
    rope_cos_sin_cache,
)


def _np_rmsnorm(x, w, eps, bias=0.0):
    var = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    return (x / np.sqrt(var + eps) * (w + bias)).astype(np.float32)


def test_rmsnorm():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 128), dtype=np.float32)
    w = rng.standard_normal(128, dtype=np.float32)
    out = rmsnorm(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), _np_rmsnorm(x, w, 1e-6), rtol=2e-5, atol=2e-5)


def test_gemma_rmsnorm():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64), dtype=np.float32)
    w = rng.standard_normal(64, dtype=np.float32)
    out = gemma_rmsnorm(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), _np_rmsnorm(x, w, 1e-6, 1.0), rtol=2e-5, atol=2e-5)


def test_fused_add_rmsnorm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 64), dtype=np.float32)
    r = rng.standard_normal((4, 64), dtype=np.float32)
    w = rng.standard_normal(64, dtype=np.float32)
    out, new_r = fused_add_rmsnorm(jnp.asarray(x), jnp.asarray(r), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(new_r), x + r, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out), _np_rmsnorm(x + r, w, 1e-6), rtol=2e-5, atol=2e-5)
    g_out, g_r = gemma_fused_add_rmsnorm(jnp.asarray(x), jnp.asarray(r), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(g_out), _np_rmsnorm(x + r, w, 1e-6, 1.0), rtol=2e-5, atol=2e-5)


def test_rmsnorm_pallas_matches_jnp():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 256), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(256, dtype=np.float32))
    out_k = rmsnorm_pallas(x, w, block_rows=8, interpret=True)
    out_j = rmsnorm(x, w)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_j), rtol=1e-5, atol=1e-5)


def test_activations():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 32), dtype=np.float32)
    gate, up = x[:, :16], x[:, 16:]
    out = silu_and_mul(jnp.asarray(x))
    want = gate / (1 + np.exp(-gate)) * up
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)
    out = gelu_tanh_and_mul(jnp.asarray(x))
    g = 0.5 * gate * (1 + np.tanh(np.sqrt(2 / np.pi) * (gate + 0.044715 * gate**3)))
    np.testing.assert_allclose(np.asarray(out), g * up, rtol=1e-4, atol=1e-4)
    out = gelu_and_mul(jnp.asarray(x))
    g_exact = np.asarray(jax.nn.gelu(jnp.asarray(gate), approximate=False))
    np.testing.assert_allclose(np.asarray(out), g_exact * up, rtol=1e-5, atol=1e-5)


def _np_rope_neox(x, pos, theta=1e4, scale=1.0, rotary_dim=None):
    d = rotary_dim or x.shape[-1]
    inv = 1.0 / theta ** (np.arange(0, d, 2) / d)
    ang = (pos[:, None] / scale) * inv[None]
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    x1, x2 = x[..., : d // 2], x[..., d // 2 : d]
    out = np.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin, x[..., d:]], -1
    )
    return out.astype(np.float32)


def test_apply_rope_pos_ids():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((6, 2, 32), dtype=np.float32)
    k = rng.standard_normal((6, 1, 32), dtype=np.float32)
    pos = np.asarray([0, 1, 2, 7, 8, 9])
    qo, ko = apply_rope_pos_ids(jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(qo), _np_rope_neox(q, pos), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ko), _np_rope_neox(k, pos), rtol=2e-5, atol=2e-5)


def test_apply_rope_ragged_offsets():
    rng = np.random.default_rng(6)
    q = rng.standard_normal((5, 1, 16), dtype=np.float32)
    k = rng.standard_normal((5, 1, 16), dtype=np.float32)
    indptr = jnp.asarray([0, 3, 5])
    offsets = jnp.asarray([10, 100])
    qo, _ = apply_rope(jnp.asarray(q), jnp.asarray(k), indptr, offsets)
    pos = np.asarray([10, 11, 12, 100, 101])
    # larger atol: XLA CPU's f32 sin/cos drifts ~1e-4 at large angles
    np.testing.assert_allclose(np.asarray(qo), _np_rope_neox(q, pos), rtol=1e-3, atol=3e-4)


def test_rope_partial_rotary_and_interleave():
    rng = np.random.default_rng(7)
    q = rng.standard_normal((4, 1, 32), dtype=np.float32)
    k = rng.standard_normal((4, 1, 32), dtype=np.float32)
    pos = np.arange(4)
    qo, _ = apply_rope_pos_ids(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos), rotary_dim=16
    )
    np.testing.assert_allclose(
        np.asarray(qo), _np_rope_neox(q, pos, rotary_dim=16), rtol=2e-5, atol=2e-5
    )
    # untouched tail
    np.testing.assert_array_equal(np.asarray(qo)[..., 16:], q[..., 16:])
    # interleave: pairs (2i, 2i+1)
    qi, _ = apply_rope_pos_ids(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos), interleave=True
    )
    d = 32
    inv = 1.0 / 1e4 ** (np.arange(0, d, 2) / d)
    ang = pos[:, None] * inv[None]
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    x1, x2 = q[..., 0::2], q[..., 1::2]
    want = np.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1).reshape(q.shape)
    np.testing.assert_allclose(np.asarray(qi), want, rtol=2e-5, atol=2e-5)


def test_llama31_rope_high_freq_unchanged():
    """Highest-frequency components should be (nearly) unscaled."""
    rng = np.random.default_rng(8)
    q = rng.standard_normal((3, 1, 64), dtype=np.float32)
    k = rng.standard_normal((3, 1, 64), dtype=np.float32)
    pos = np.asarray([0, 5, 11])
    qo, _ = apply_llama31_rope_pos_ids(jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos))
    plain = _np_rope_neox(q, pos, theta=5e5)
    # first rotary pair = highest frequency -> llama31 keeps it
    np.testing.assert_allclose(np.asarray(qo)[..., 0], plain[..., 0], rtol=1e-4, atol=1e-4)


def test_rope_cos_sin_cache_path():
    rng = np.random.default_rng(9)
    nnz, h, d = 5, 2, 32
    q = rng.standard_normal((nnz, h * d), dtype=np.float32)
    k = rng.standard_normal((nnz, h * d), dtype=np.float32)
    pos = np.asarray([0, 1, 2, 3, 4])
    cache = rope_cos_sin_cache(16, d)
    qo, ko = apply_rope_with_cos_sin_cache(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(k), d, cache
    )
    want, _ = apply_rope_pos_ids(
        jnp.asarray(q.reshape(nnz, h, d)), jnp.asarray(k.reshape(nnz, h, d)),
        jnp.asarray(pos),
    )
    np.testing.assert_allclose(np.asarray(qo), np.asarray(want).reshape(nnz, -1), rtol=2e-5, atol=2e-5)


def test_packbits_roundtrip():
    rng = np.random.default_rng(10)
    bits = rng.integers(0, 2, 37).astype(bool)
    packed = packbits(jnp.asarray(bits))
    np.testing.assert_array_equal(np.asarray(packed), np.packbits(bits))
    np.testing.assert_array_equal(np.asarray(unpackbits(packed, 37)), bits)


def test_segment_packbits():
    bits = np.asarray([1, 0, 1, 1, 1, 0, 0, 1, 1, 0, 1], np.uint8)
    indptr = np.asarray([0, 3, 3, 11])
    packed, new_indptr = segment_packbits(jnp.asarray(bits), jnp.asarray(indptr))
    np.testing.assert_array_equal(np.asarray(new_indptr), [0, 1, 1, 2])
    np.testing.assert_array_equal(
        np.asarray(packed), [np.packbits(bits[:3])[0], np.packbits(bits[3:])[0]]
    )


def test_mla_rope_quantize_fp8():
    """Fused MLA rope+quant equals rope-then-quantize composed by hand
    (reference rope.py:1154)."""
    import numpy as np
    from flashinfer_tpu.ops.rope import (
        apply_rope_with_cos_sin_cache,
        mla_rope_quantize_fp8,
        rope_cos_sin_cache,
    )

    rng = np.random.default_rng(0)
    nnz, h, rd, nd = 6, 4, 32, 64
    q_rope = jnp.asarray(rng.standard_normal((nnz, h, rd)), jnp.float32)
    k_rope = jnp.asarray(rng.standard_normal((nnz, rd)), jnp.float32)
    q_nope = jnp.asarray(rng.standard_normal((nnz, h, nd)), jnp.float32)
    k_nope = jnp.asarray(rng.standard_normal((nnz, nd)), jnp.float32)
    cache = rope_cos_sin_cache(128, rd)
    pos = jnp.asarray(rng.integers(0, 128, nnz), jnp.int32)

    qr8, kr8, qn8, kn8 = mla_rope_quantize_fp8(
        q_rope, k_rope, q_nope, k_nope, cache, pos,
        quant_scale_q=0.5, quant_scale_kv=0.25,
    )
    assert qr8.dtype == jnp.float8_e4m3fn

    # oracle: rope via the public cos-sin-cache op, then quantize
    qq, kk = apply_rope_with_cos_sin_cache(
        pos, q_rope.reshape(nnz, h * rd), k_rope, rd, cache)
    ref_qr = (qq.reshape(nnz, h, rd).astype(jnp.float32) * 0.5
              ).astype(jnp.float8_e4m3fn)
    ref_kr = (kk.astype(jnp.float32) * 0.25).astype(jnp.float8_e4m3fn)
    np.testing.assert_array_equal(
        np.asarray(qr8, np.float32), np.asarray(ref_qr, np.float32))
    np.testing.assert_array_equal(
        np.asarray(kr8, np.float32), np.asarray(ref_kr, np.float32))
    np.testing.assert_array_equal(
        np.asarray(qn8, np.float32),
        np.asarray((q_nope * 0.5).astype(jnp.float8_e4m3fn), np.float32))


def test_silu_and_mul_nvfp4_batched_quantize():
    """Fused act+mask+nvfp4 equals the composed ops (reference
    activation.py:145)."""
    import numpy as np
    from flashinfer_tpu.ops.activation import (
        silu_and_mul,
        silu_and_mul_nvfp4_batched_quantize,
    )
    from flashinfer_tpu.ops.fp4 import fp4_dequantize

    rng = np.random.default_rng(0)
    B, M, K = 2, 4, 64
    a = jnp.asarray(rng.standard_normal((B, M, 2 * K)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.3)
    gsf = jnp.ones((1,), jnp.float32)
    q, sf = silu_and_mul_nvfp4_batched_quantize(a, mask, gsf)
    assert q.shape == (B, M, K // 2)
    deq = np.asarray(fp4_dequantize(q, sf, sf_vec_size=16))
    ref = np.asarray(silu_and_mul(a)) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(deq, ref, atol=0.35, rtol=0.35)
