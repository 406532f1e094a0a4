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
