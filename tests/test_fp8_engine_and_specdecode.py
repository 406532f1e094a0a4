"""FP8 KV-cache serving + speculative-decode verification (XQA parity).

The reference covers these as: FP8 KV attention (prefill/decode k_scale,
v_scale), XQA speculative-decode kernels (xqa.py — qo_len>1 decode), and
chain_speculative_sampling (sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashinfer_tpu as fi
from flashinfer_tpu.models.llama import LlamaConfig
from flashinfer_tpu.serving import EngineConfig, LlamaServingEngine


def test_engine_fp8_kv_close_to_bf16():
    mc = LlamaConfig.tiny()
    kw = dict(model=mc, max_batch=2, num_pages=32, page_size=8,
              max_seq_len=64, greedy=True, interpret=True)
    eng16 = LlamaServingEngine(EngineConfig(**kw), seed=0)
    eng8 = LlamaServingEngine(
        EngineConfig(kv_dtype="fp8_e4m3", kv_scale=0.02, **kw), seed=0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, mc.vocab_size, 6).tolist()
    r16 = eng16.add_request(prompt, 4)
    r8 = eng8.add_request(prompt, 4)
    eng16.run_to_completion(40)
    eng8.run_to_completion(40)
    assert r16.done and r8.done
    # fp8 KV quantization shifts logits slightly; greedy paths usually agree
    # on the first token and never produce invalid ids
    assert all(0 <= t < mc.vocab_size for t in r8.output)
    assert r8.output[0] == r16.output[0]


def test_spec_decode_qo_gt1_matches_reference():
    """XQA-style speculative verification: each request scores several draft
    tokens against the paged cache in one run (qo_len>1 decode)."""
    rng = np.random.default_rng(1)
    B, DRAFT, HQ, HKV, D, PS = 3, 4, 8, 2, 64, 16
    kv_lens = [20, 33, 16]  # includes the draft tokens
    pages = [-(-l // PS) for l in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages)]).astype(np.int32)
    indices = np.arange(sum(pages), dtype=np.int32)
    last = np.asarray([l - (p - 1) * PS for l, p in zip(kv_lens, pages)],
                      np.int32)
    kc = jnp.asarray(
        rng.standard_normal((sum(pages) + 1, PS, HKV, D)), jnp.float32)
    vc = jnp.asarray(
        rng.standard_normal((sum(pages) + 1, PS, HKV, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B * DRAFT, HQ, D)), jnp.float32)
    qo_indptr = np.arange(B + 1) * DRAFT

    for backend in ("reference", "pallas"):
        w = fi.BatchPrefillWithPagedKVCacheWrapper(
            kv_layout="NHD", backend=backend)
        w.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS, causal=True)
        o = w.run(q, (kc, vc),
                  interpret=True if backend == "pallas" else None)
        if backend == "reference":
            want = o
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(want, np.float32),
        rtol=2e-5, atol=2e-5)


def test_chain_speculative_sampling_accepts_good_drafts():
    """Draft tokens drawn from the target distribution should mostly be
    accepted (reference sampling.py chain_speculative_sampling)."""
    rng = np.random.default_rng(2)
    B, DRAFT, V = 8, 3, 64
    target = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, DRAFT + 1, V)), jnp.float32) * 2,
        axis=-1)
    # perfect drafts: argmax of the target at each position
    draft_ids = jnp.argmax(target[:, :DRAFT], axis=-1).astype(jnp.int32)
    draft_probs = jax.nn.one_hot(draft_ids, V, dtype=jnp.float32)
    out_ids, accepted, emitted = fi.chain_speculative_sampling(
        draft_probs, draft_ids, target, jax.random.key(0))
    assert out_ids.shape == (B, DRAFT + 1)
    # every draft matches its own one-hot distribution => acceptance is
    # bounded by target prob of that token; most should be accepted
    assert float(jnp.mean(accepted)) > 0.3
    # output ids are valid and -1-padded after the first rejection
    ids = np.asarray(out_ids)
    assert ((ids >= -1) & (ids < V)).all()


def test_spec_engine_greedy_matches_nonspec():
    """Distribution exactness: a greedy spec-decoding engine must emit
    EXACTLY the non-spec engine's tokens (verification only reorders
    compute, never changes results). Reference: fast_decode_plan
    (decode.py:2416) + chain_speculative_sampling."""
    mc = LlamaConfig.tiny()
    kw = dict(model=mc, max_batch=2, num_pages=32, page_size=8,
              max_seq_len=64, greedy=True, interpret=True)
    base = LlamaServingEngine(EngineConfig(**kw), seed=0)
    spec = LlamaServingEngine(EngineConfig(spec_tokens=3, **kw), seed=0)
    rng = np.random.default_rng(5)
    # a repetitive prompt gives the n-gram proposer real hits
    core = rng.integers(0, mc.vocab_size, 4).tolist()
    prompts = [core * 3, core * 2 + core[:2]]
    n_new = [8, 6]
    rb = [base.add_request(p, n) for p, n in zip(prompts, n_new)]
    rs = [spec.add_request(p, n) for p, n in zip(prompts, n_new)]
    base.run_to_completion(64)
    spec.run_to_completion(64)
    for b, s in zip(rb, rs):
        assert b.done and s.done
        assert s.output == b.output, (s.output, b.output)
    # verification emits >= 1 token/seq/step, so spec never needs more steps
    assert spec.steps <= base.steps


def test_spec_engine_sampled_emits_valid_tokens():
    """Stochastic spec decoding (one-hot draft dists through
    chain_speculative_sampling) produces valid ids and exact counts."""
    mc = LlamaConfig.tiny()
    eng = LlamaServingEngine(
        EngineConfig(model=mc, max_batch=2, num_pages=32, page_size=8,
                     max_seq_len=64, spec_tokens=2, interpret=True,
                     temperature=0.8), seed=3)
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, mc.vocab_size, 5).tolist()
    reqs = [eng.add_request(prompt * 2, 6), eng.add_request(prompt, 4)]
    eng.run_to_completion(64)
    for r, n in zip(reqs, (6, 4)):
        assert r.done
        assert len(r.output) == n
        assert all(0 <= t < mc.vocab_size for t in r.output)


def test_propose_ngram():
    from flashinfer_tpu.serving.engine import propose_ngram

    # suffix [7, 8] occurred earlier, followed by 9, 1, 2
    assert propose_ngram([7, 8, 9, 1, 2, 7, 8], 3, 3) == [9, 1, 2]
    # continuation shorter than requested pads with its last token
    assert propose_ngram([5, 6, 1, 5, 6], 3, 2) == [1, 5, 6]
    # no match falls back to repeating the last token
    assert propose_ngram([1, 2, 3], 2, 3) == [3, 3]
    assert propose_ngram([4], 2, 3) == [4, 4]
