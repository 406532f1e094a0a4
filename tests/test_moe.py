"""Fused MoE tests (reference: tests/moe/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.activation import silu_and_mul
from flashinfer_tpu.ops.fused_moe import (
    RoutingMethodType,
    cutlass_fused_moe,
    fused_moe,
    route_tokens,
    trtllm_fp8_per_tensor_scale_moe,
)


def _moe_oracle(x, w13, w2, ids, scales):
    """Dense per-token loop oracle."""
    m, hidden = x.shape
    out = np.zeros((m, hidden), np.float64)
    for t in range(m):
        for j in range(ids.shape[1]):
            e = int(ids[t, j])
            h = np.asarray(x[t], np.float64) @ np.asarray(w13[e], np.float64).T
            d = h.shape[-1] // 2
            gate, up = h[:d], h[d:]
            h = gate / (1 + np.exp(-gate)) * up
            o = h @ np.asarray(w2[e], np.float64).T
            out[t] += float(scales[t, j]) * o
    return out


def test_route_tokens_default_and_renormalize():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    ids, scales = route_tokens(logits, 2, RoutingMethodType.Default)
    probs = np.asarray(jax.nn.softmax(logits, -1))
    for t in range(6):
        top2 = set(np.argsort(-probs[t])[:2].tolist())
        assert set(np.asarray(ids[t]).tolist()) == top2
    ids_r, scales_r = route_tokens(logits, 2, RoutingMethodType.Renormalize)
    np.testing.assert_allclose(np.asarray(scales_r).sum(-1), 1.0, rtol=1e-5)


def test_route_tokens_deepseek_group_limited():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    ids, scales = route_tokens(
        logits, 4, RoutingMethodType.DeepSeekV3, n_group=4, topk_group=2
    )
    # selected experts must come from <= 2 distinct groups
    for t in range(4):
        groups = set((np.asarray(ids[t]) // 4).tolist())
        assert len(groups) <= 2
    np.testing.assert_allclose(np.asarray(scales).sum(-1), 1.0, rtol=1e-5)


def test_fused_moe_matches_oracle():
    rng = np.random.default_rng(2)
    m, hidden, inter, e, k = 6, 16, 8, 4, 2
    x = jnp.asarray(rng.standard_normal((m, hidden)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (m, k)), jnp.int32)
    scales = jnp.asarray(rng.uniform(0, 1, (m, k)), jnp.float32)
    out = fused_moe(x, w13, w2, ids, scales)
    want = _moe_oracle(x, w13, w2, np.asarray(ids), np.asarray(scales))
    np.testing.assert_allclose(np.asarray(out, np.float64), want, rtol=2e-3,
                               atol=2e-3)


def test_cutlass_fused_moe_alias():
    rng = np.random.default_rng(3)
    m, hidden, inter, e = 3, 8, 4, 2
    x = jnp.asarray(rng.standard_normal((m, hidden)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)), jnp.float32)
    ids = jnp.asarray([[0], [1], [0]], jnp.int32)
    scales = jnp.ones((m, 1), jnp.float32)
    out = cutlass_fused_moe(x, ids, scales, w13, w2, jnp.float32)
    want = _moe_oracle(x, w13, w2, np.asarray(ids), np.asarray(scales))
    np.testing.assert_allclose(np.asarray(out, np.float64), want, rtol=2e-3,
                               atol=2e-3)


def test_trtllm_fp8_per_tensor_moe_runs():
    rng = np.random.default_rng(4)
    m, hidden, inter, e, k = 4, 16, 8, 4, 2
    logits = jnp.asarray(rng.standard_normal((m, e)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, hidden)), jnp.bfloat16)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)),
                      jnp.float8_e4m3fn)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)), jnp.float8_e4m3fn)
    out = trtllm_fp8_per_tensor_scale_moe(
        logits, None, x, w13, jnp.asarray(1.0), w2, jnp.asarray(1.0),
        num_experts=e, top_k=k, n_group=None, topk_group=None,
        intermediate_size=inter,
    )
    assert out.shape == (m, hidden)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
