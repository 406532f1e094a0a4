"""Merge-state algebra tests (reference: tests for cascade.py merge ops)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu import (
    merge_state,
    merge_state_in_place,
    merge_states,
    variable_length_merge_states,
)
from flashinfer_tpu.ops.attention.reference import attention_reference


def _rand_state(rng, seq, heads, dim):
    v = rng.standard_normal((seq, heads, dim), dtype=np.float32)
    s = rng.standard_normal((seq, heads)).astype(np.float32)
    return jnp.asarray(v), jnp.asarray(s)


def _oracle_merge(vs, ss):
    """Merge by definition: states are (sum exp*v / sum exp, log sum exp)."""
    ss = np.stack([np.asarray(s, np.float64) for s in ss], 0)  # [n, seq, h]
    vs = np.stack([np.asarray(v, np.float64) for v in vs], 0)
    w = np.exp(ss)  # fine in f64 for test ranges
    d = w.sum(0)
    v = (vs * w[..., None]).sum(0) / d[..., None]
    return v, np.log(d)


def test_merge_state_matches_definition():
    rng = np.random.default_rng(0)
    v_a, s_a = _rand_state(rng, 32, 4, 64)
    v_b, s_b = _rand_state(rng, 32, 4, 64)
    v, s = merge_state(v_a, s_a, v_b, s_b)
    v_ref, s_ref = _oracle_merge([v_a, v_b], [s_a, s_b])
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-4, atol=2e-4)


def test_merge_state_commutative_associative():
    rng = np.random.default_rng(1)
    states = [_rand_state(rng, 8, 2, 16) for _ in range(3)]
    (v0, s0), (v1, s1), (v2, s2) = states
    va, sa = merge_state(*merge_state(v0, s0, v1, s1), v2, s2)
    vb, sb = merge_state(v0, s0, *merge_state(v1, s1, v2, s2))
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=2e-4, atol=2e-4)
    vc, sc = merge_state(v1, s1, v0, s0)
    vd, sd = merge_state(v0, s0, v1, s1)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vd), rtol=1e-6)


def test_merge_states_n_way():
    rng = np.random.default_rng(2)
    n = 5
    vs, ss = zip(*[_rand_state(rng, 16, 3, 32) for _ in range(n)])
    v = jnp.stack(vs, axis=1)  # [seq, n, h, d]
    s = jnp.stack(ss, axis=1)
    v_out, s_out = merge_states(v, s)
    v_ref, s_ref = _oracle_merge(vs, ss)
    np.testing.assert_allclose(np.asarray(v_out), v_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_out), s_ref, rtol=2e-4, atol=2e-4)


def test_merge_neg_inf_identity():
    """A fully-masked state is the identity element."""
    rng = np.random.default_rng(3)
    v_a, s_a = _rand_state(rng, 8, 2, 16)
    v_b = jnp.zeros_like(v_a)
    s_b = jnp.full_like(s_a, float("-inf"))
    v, s = merge_state(v_a, s_a, v_b, s_b)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_a), rtol=1e-6)
    # both masked -> stays masked
    v2, s2 = merge_state(v_b, s_b, v_b, s_b)
    assert np.all(np.isneginf(np.asarray(s2)))
    assert np.all(np.asarray(v2) == 0)


def test_merge_state_in_place_mask():
    rng = np.random.default_rng(4)
    v, s = _rand_state(rng, 8, 2, 16)
    v_o, s_o = _rand_state(rng, 8, 2, 16)
    mask = jnp.asarray(rng.integers(0, 2, 8).astype(bool))
    v_new, s_new = merge_state_in_place(v, s, v_o, s_o, mask=mask)
    v_full, s_full = merge_state(v, s, v_o, s_o)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(v_new)[m], np.asarray(v_full)[m], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_new)[~m], np.asarray(v)[~m], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_new)[~m], np.asarray(s)[~m], rtol=1e-6)


def test_variable_length_merge_matches_split_attention():
    """Split-KV correctness: attention over full kv == merge of chunk states."""
    rng = np.random.default_rng(5)
    qo, kv, h, d = 4, 96, 2, 32
    q = jnp.asarray(rng.standard_normal((qo, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, h, d)), jnp.float32)
    full, full_lse = attention_reference(q, k, v)

    chunks = [(0, 32), (32, 64), (64, 96)]
    partial_v, partial_s = [], []
    for lo, hi in chunks:
        o, lse = attention_reference(q, k[lo:hi], v[lo:hi])
        partial_v.append(o)
        partial_s.append(lse)
    # layout: per output row, its partials contiguous
    pv = jnp.stack(partial_v, 1).reshape(qo * len(chunks), h, d)
    ps = jnp.stack(partial_s, 1).reshape(qo * len(chunks), h)
    merge_indptr = jnp.arange(qo + 1) * len(chunks)
    v_out, s_out = variable_length_merge_states(pv, ps, merge_indptr, qo)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(full), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(full_lse), rtol=2e-5, atol=2e-5)
