"""Sampling op tests (reference: tests/utils/test_sampling.py style —
statistical checks against the math, plus set-membership checks for the
truncation samplers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.sampling import (
    chain_speculative_sampling,
    min_p_sampling_from_probs,
    sampling_from_logits,
    sampling_from_probs,
    softmax,
    top_k_mask_logits,
    top_k_renorm_probs,
    top_k_sampling_from_probs,
    top_k_top_p_sampling_from_probs,
    top_p_renorm_probs,
    top_p_sampling_from_probs,
)


def _probs(rng, batch, vocab, concentrated=False):
    logits = rng.standard_normal((batch, vocab)) * (4.0 if concentrated else 1.0)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    return (p / p.sum(-1, keepdims=True)).astype(np.float32)


def test_softmax_temperature():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 50)).astype(np.float32)
    out = softmax(jnp.asarray(logits), temperature=2.0)
    want = np.exp(logits / 2.0 - (logits / 2.0).max(-1, keepdims=True))
    want /= want.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)
    # t = 0 -> one-hot argmax
    out0 = softmax(jnp.asarray(logits), temperature=jnp.asarray([0.0, 1.0, 0.0]))
    assert np.argmax(np.asarray(out0)[0]) == np.argmax(logits[0])
    np.testing.assert_allclose(np.asarray(out0)[0].max(), 1.0)


def test_sampling_from_probs_distribution():
    rng = np.random.default_rng(1)
    p = _probs(rng, 1, 16)
    p_rep = jnp.asarray(np.repeat(p, 4096, axis=0))
    toks = sampling_from_probs(p_rep, jax.random.key(0))
    freq = np.bincount(np.asarray(toks), minlength=16) / 4096
    np.testing.assert_allclose(freq, p[0], atol=0.03)


def test_sampling_from_logits_matches_softmax_dist():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((1, 12)).astype(np.float32)
    lr = jnp.asarray(np.repeat(logits, 4096, axis=0))
    toks = sampling_from_logits(lr, jax.random.key(1))
    p = np.exp(logits[0] - logits[0].max())
    p /= p.sum()
    freq = np.bincount(np.asarray(toks), minlength=12) / 4096
    np.testing.assert_allclose(freq, p, atol=0.03)


def _topp_set(p_row, top_p):
    order = np.argsort(-p_row)
    cum = np.cumsum(p_row[order])
    keep_n = int(np.searchsorted(cum, top_p) + 1)
    return set(order[:keep_n].tolist())


def test_top_p_sampling_stays_in_nucleus():
    rng = np.random.default_rng(3)
    p = _probs(rng, 8, 64, concentrated=True)
    toks = np.asarray(
        top_p_sampling_from_probs(
            jnp.asarray(np.tile(p, (64, 1))), jax.random.key(2), 0.7
        )
    )
    for i, tok in enumerate(toks):
        allowed = _topp_set(p[i % 8], 0.7)
        assert tok in allowed, (i, tok, allowed)


def test_top_k_sampling_stays_in_topk():
    rng = np.random.default_rng(4)
    p = _probs(rng, 8, 64)
    toks = np.asarray(
        top_k_sampling_from_probs(
            jnp.asarray(np.tile(p, (64, 1))), jax.random.key(3), 5
        )
    )
    for i, tok in enumerate(toks):
        top5 = set(np.argsort(-p[i % 8])[:5].tolist())
        assert tok in top5


def test_min_p_sampling_threshold():
    rng = np.random.default_rng(5)
    p = _probs(rng, 4, 32, concentrated=True)
    toks = np.asarray(
        min_p_sampling_from_probs(
            jnp.asarray(np.tile(p, (64, 1))), jax.random.key(4), 0.3
        )
    )
    for i, tok in enumerate(toks):
        row = p[i % 4]
        assert row[tok] >= 0.3 * row.max() - 1e-6


def test_top_k_top_p_joint():
    rng = np.random.default_rng(6)
    p = _probs(rng, 4, 64, concentrated=True)
    toks = np.asarray(
        top_k_top_p_sampling_from_probs(
            jnp.asarray(np.tile(p, (64, 1))), jax.random.key(5), 8, 0.9,
            filter_apply_order="joint",
        )
    )
    for i, tok in enumerate(toks):
        row = p[i % 4]
        top8 = set(np.argsort(-row)[:8].tolist())
        assert tok in top8 and tok in _topp_set(row, 0.9)


def test_top_p_renorm():
    rng = np.random.default_rng(7)
    p = _probs(rng, 4, 64, concentrated=True)
    out = np.asarray(top_p_renorm_probs(jnp.asarray(p), 0.8))
    for i in range(4):
        keep = _topp_set(p[i], 0.8)
        nz = set(np.nonzero(out[i])[0].tolist())
        assert nz == keep
        np.testing.assert_allclose(out[i].sum(), 1.0, rtol=1e-5)
        # kept entries proportional to original
        ks = sorted(keep)
        ratio = out[i][ks] / p[i][ks]
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)


def test_top_k_renorm_and_mask():
    rng = np.random.default_rng(8)
    p = _probs(rng, 4, 64)
    out = np.asarray(top_k_renorm_probs(jnp.asarray(p), 10))
    for i in range(4):
        top10 = set(np.argsort(-p[i])[:10].tolist())
        assert set(np.nonzero(out[i])[0].tolist()) == top10
        np.testing.assert_allclose(out[i].sum(), 1.0, rtol=1e-5)
    logits = rng.standard_normal((4, 64)).astype(np.float32)
    masked = np.asarray(top_k_mask_logits(jnp.asarray(logits), 7))
    for i in range(4):
        top7 = set(np.argsort(-logits[i])[:7].tolist())
        assert set(np.nonzero(np.isfinite(masked[i]))[0].tolist()) == top7
        np.testing.assert_array_equal(masked[i][sorted(top7)], logits[i][sorted(top7)])


def test_sampling_with_indices():
    rng = np.random.default_rng(9)
    p = _probs(rng, 2, 16, concentrated=True)
    # rows 0..3 all sample from p[0] (one-hot-ish), rows 4..7 from p[1]
    p0 = np.zeros((2, 16), np.float32)
    p0[0, 3] = 1.0
    p0[1, 9] = 1.0
    idx = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    toks = np.asarray(
        sampling_from_probs(jnp.asarray(p0), jax.random.key(6), indices=idx)
    )
    np.testing.assert_array_equal(toks, [3, 3, 3, 3, 9, 9, 9, 9])


def test_chain_speculative_sampling_accept_all():
    """Draft == target -> everything accepted, bonus token emitted."""
    vocab = 8
    draft = np.full((1, 3, vocab), 1.0 / vocab, np.float32)
    target = np.full((1, 4, vocab), 1.0 / vocab, np.float32)
    ids = np.asarray([[2, 5, 1]], np.int32)
    out, acc, emit = chain_speculative_sampling(
        jnp.asarray(draft), jnp.asarray(ids), jnp.asarray(target), jax.random.key(7)
    )
    out = np.asarray(out)
    assert np.asarray(acc)[0] == 3
    np.testing.assert_array_equal(out[0, :3], ids[0])
    assert 0 <= out[0, 3] < vocab


def test_chain_speculative_sampling_reject_first():
    """Target puts zero mass on the draft token -> rejected at step 0 and
    resampled from the residual."""
    vocab = 4
    draft = np.zeros((1, 2, vocab), np.float32)
    draft[:, :, 0] = 1.0  # draft always proposes token 0
    target = np.zeros((1, 3, vocab), np.float32)
    target[:, :, 3] = 1.0  # target wants token 3
    ids = np.asarray([[0, 0]], np.int32)
    out, acc, _ = chain_speculative_sampling(
        jnp.asarray(draft), jnp.asarray(ids), jnp.asarray(target), jax.random.key(8)
    )
    out = np.asarray(out)
    assert np.asarray(acc)[0] == 0
    assert out[0, 0] == 3  # resampled from residual = target
    np.testing.assert_array_equal(out[0, 1:], [-1, -1])


def test_fused_family_renorm_and_mask_match_xla():
    """Pallas family renorm/mask outputs == the XLA paths (same bisection
    algorithm on the VMEM-resident tile)."""
    from flashinfer_tpu.ops.sampling import _family_call

    rng = np.random.default_rng(11)
    batch, vocab = 12, 640
    logits = rng.standard_normal((batch, vocab)).astype(np.float32) * 3
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True), jnp.float32)
    kk = jnp.full((batch, 1), 9, jnp.int32)
    pp = jnp.full((batch, 1), 0.75, jnp.float32)
    ones_i = jnp.ones((batch, 1), jnp.int32)
    ones_f = jnp.ones((batch, 1), jnp.float32)

    got = np.asarray(_family_call(probs, None, kk, ones_f,
                                  filt="top_k", out_mode="renorm",
                                  interpret=True))
    want = np.asarray(top_k_renorm_probs(probs, 9, backend="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    got = np.asarray(_family_call(probs, None, ones_i, pp,
                                  filt="top_p", out_mode="renorm",
                                  interpret=True))
    want = np.asarray(top_p_renorm_probs(probs, 0.75, backend="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    x = jnp.asarray(logits)
    got = np.asarray(_family_call(x, None, kk, ones_f,
                                  filt="top_k", out_mode="mask_logits",
                                  interpret=True))
    want = np.asarray(top_k_mask_logits(x, 9, backend="xla"))
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-6)

    # k >= vocab / p >= 1 keep everything
    got = np.asarray(_family_call(probs, None,
                                  jnp.full((batch, 1), vocab, jnp.int32),
                                  ones_f, filt="top_k", out_mode="renorm",
                                  interpret=True))
    np.testing.assert_allclose(got, np.asarray(probs), rtol=1e-5, atol=1e-7)


def test_fused_family_samplers_stay_in_set():
    """Each fused sampler only ever draws from its admissible set, and the
    unfiltered Gumbel draw reproduces the distribution."""
    from flashinfer_tpu.ops.sampling import _family_call

    rng = np.random.default_rng(12)
    batch, vocab = 16, 384
    logits = rng.standard_normal((batch, vocab)) * 4
    probs_np = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
                ).astype(np.float32)
    probs = jnp.asarray(probs_np)
    kk = jnp.full((batch, 1), 6, jnp.int32)
    pp = jnp.full((batch, 1), 0.7, jnp.float32)
    mp = jnp.full((batch, 1), 0.25, jnp.float32)
    ones_i = jnp.ones((batch, 1), jnp.int32)
    ones_f = jnp.ones((batch, 1), jnp.float32)

    cases = {
        "top_k": (kk, ones_f,
                  lambda r: set(np.argsort(-r)[:6].tolist())),
        "top_p": (ones_i, pp, lambda r: _topp_set(r, 0.7)),
        "min_p": (ones_i, mp,
                  lambda r: set(np.nonzero(r >= 0.25 * r.max())[0].tolist())),
        "top_k_top_p_joint": (
            kk, pp,
            lambda r: set(np.argsort(-r)[:6].tolist()) & _topp_set(r, 0.7)),
    }
    for filt, (karg, parg, set_fn) in cases.items():
        for i in range(6):
            toks = np.asarray(_family_call(
                probs, jax.random.key(100 + i), karg, parg,
                filt=filt, out_mode="sample", interpret=True))
            for b in range(batch):
                assert toks[b] in set_fn(probs_np[b]), (filt, b, toks[b])

    # unfiltered categorical: empirical freq ~ probs on a repeated row
    p1 = _probs(np.random.default_rng(13), 1, 16)
    rep = jnp.asarray(np.repeat(p1, 512, axis=0))
    draws = []
    for i in range(8):
        draws.append(np.asarray(_family_call(
            rep, jax.random.key(200 + i),
            jnp.ones((512, 1), jnp.int32), jnp.ones((512, 1), jnp.float32),
            filt="none", out_mode="sample", interpret=True)))
    freq = np.bincount(np.concatenate(draws), minlength=16) / (512 * 8)
    np.testing.assert_allclose(freq, p1[0], atol=0.03)


def test_fused_sampler_kernel_interpret():
    """Pallas single-pass sampler: every draw lies in the top-k/top-p set
    and high-probability tokens dominate (Gumbel-max categorical)."""
    from flashinfer_tpu.ops.sampling import (
        _fused_top_k_top_p_sample,
        top_k_renorm_probs,
        top_p_renorm_probs,
    )

    rng = np.random.default_rng(0)
    batch, vocab, k, p = 16, 512, 8, 0.8
    logits = rng.standard_normal((batch, vocab)) * 3
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True), jnp.float32)
    kk = jnp.full((batch, 1), k, jnp.int32)
    pp = jnp.full((batch, 1), p, jnp.float32)

    # the admissible set per the library's own renorm ops
    allowed = np.asarray(
        top_p_renorm_probs(top_k_renorm_probs(probs, k), p)) > 0

    draws = []
    for i in range(20):
        toks = np.asarray(_fused_top_k_top_p_sample(
            probs, jax.random.PRNGKey(i), kk, pp, interpret=True))
        draws.append(toks)
        for b in range(batch):
            assert allowed[b, toks[b]], (b, toks[b])
    draws = np.stack(draws)
    # the argmax token should be drawn most often for peaked rows
    top_tok = np.asarray(jnp.argmax(probs, -1))
    freq_top = (draws == top_tok[None, :]).mean()
    assert freq_top > 0.25, freq_top
