"""Oracle self-consistency tests (mask algebra, GQA, variants, sinks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.attention.variants import FlashSigmoid, make_default_variant


def _qkv(rng, qo, kv, hq, hkv, d, dv=None):
    dv = dv or d
    q = jnp.asarray(rng.standard_normal((qo, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, hkv, dv)), jnp.float32)
    return q, k, v


def test_causal_equals_explicit_mask():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, 8, 12, 2, 2, 16)
    out_c, lse_c = attention_reference(q, k, v, causal=True)
    q_pos = np.arange(8)[:, None] + (12 - 8)
    kv_pos = np.arange(12)[None, :]
    mask = jnp.asarray(kv_pos <= q_pos)
    out_m, lse_m = attention_reference(q, k, v, custom_mask=mask)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_m), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_c), np.asarray(lse_m), rtol=2e-5, atol=1e-6)


def test_gqa_equals_repeated_heads():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, 4, 16, 8, 2, 32)
    out_g, _ = attention_reference(q, k, v)
    k_rep = jnp.repeat(k, 4, axis=1)
    v_rep = jnp.repeat(v, 4, axis=1)
    out_r, _ = attention_reference(q, k_rep, v_rep)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_r), rtol=2e-5, atol=1e-6)


def test_kv_len_masking():
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, 4, 16, 2, 2, 16)
    out_a, _ = attention_reference(q, k, v, kv_len=10)
    out_b, _ = attention_reference(q, k[:10], v[:10])
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=2e-5, atol=1e-6)


def test_sliding_window():
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, 6, 6, 1, 1, 8)
    out, _ = attention_reference(q, k, v, causal=True, window_left=1)
    # row i attends to positions {i-1, i}; row 0 only {0}
    q_pos = np.arange(6)[:, None]
    kv_pos = np.arange(6)[None, :]
    mask = jnp.asarray((kv_pos <= q_pos) & (kv_pos > q_pos - 2))
    out_m, _ = attention_reference(q, k, v, custom_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), rtol=2e-5, atol=1e-6)


def test_soft_cap_variant():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, 4, 8, 2, 2, 16)
    var = make_default_variant(logits_soft_cap=5.0)
    out, _ = attention_reference(q, k, v, variant=var)
    # manual: logits scaled then tanh-capped (jnp.tanh: XLA CPU's tanh is a
    # polynomial approx ~1e-4 off np.tanh, so use the same primitive)
    scale = 1.0 / np.sqrt(16)
    logits = np.einsum("qhd,khd->hqk", np.asarray(q), np.asarray(k)) * scale
    capped = np.asarray(5.0 * jnp.tanh(jnp.asarray(logits, jnp.float32) / 5.0))
    p = np.exp(capped - capped.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("hqk,khd->qhd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_attention_sink_reduces_weights():
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, 2, 4, 2, 2, 8)
    out_plain, lse_plain = attention_reference(q, k, v)
    sink = jnp.asarray([50.0, 50.0])  # huge sink swallows all probability
    out_sink, lse_sink = attention_reference(q, k, v, sink=sink)
    assert np.all(np.abs(np.asarray(out_sink)) < 1e-3)
    assert np.all(np.asarray(lse_sink) > np.asarray(lse_plain))


def test_flash_sigmoid_variant():
    rng = np.random.default_rng(6)
    q, k, v = _qkv(rng, 3, 5, 1, 1, 8)
    out, _ = attention_reference(q, k, v, variant=FlashSigmoid(scale=0.5))
    scale = 1.0 / np.sqrt(8)
    logits = np.einsum("qhd,khd->hqk", np.asarray(q), np.asarray(k)) * scale
    w = 1.0 / (1.0 + np.exp(-logits * 0.5))
    want = np.einsum("hqk,khd->qhd", w, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_alibi():
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, 4, 4, 2, 2, 8)
    slopes = jnp.asarray([0.1, 0.5])
    out, _ = attention_reference(q, k, v, causal=True, alibi_slopes=slopes)
    scale = 1.0 / np.sqrt(8)
    logits = np.einsum("qhd,khd->hqk", np.asarray(q), np.asarray(k)) * scale
    bias = np.asarray(slopes)[:, None, None] * (
        np.arange(4)[None, None, :] - np.arange(4)[None, :, None]
    )
    logits = logits + bias
    mask = np.arange(4)[None, :] <= np.arange(4)[:, None]
    logits = np.where(mask[None], logits, -np.inf)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("hqk,khd->qhd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_head_dim_vo_differs():
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, 4, 8, 2, 2, 32, dv=16)
    out, _ = attention_reference(q, k, v)
    assert out.shape == (4, 2, 16)
