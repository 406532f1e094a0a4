"""Serving engine: continuous batching over the paged runtime, greedy
decode cross-checked against the dense oracle forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.models.llama import LlamaConfig, llama_forward_dense
from flashinfer_tpu.serving import EngineConfig, LlamaServingEngine


@pytest.fixture(scope="module")
def engine_setup():
    mc = LlamaConfig.tiny()
    cfg = EngineConfig(
        model=mc, max_batch=4, num_pages=64, page_size=8, max_seq_len=128,
        greedy=True, interpret=True,
    )
    eng = LlamaServingEngine(cfg, seed=0)
    return mc, cfg, eng


def _dense_greedy(params, mc, prompt, n_new):
    """Oracle: greedy continuation via full dense re-forward each step."""
    toks = list(prompt)
    for _ in range(n_new):
        logits = llama_forward_dense(
            params, jnp.asarray([toks], jnp.int32), mc
        )
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_engine_matches_dense_oracle(engine_setup):
    mc, cfg, eng = engine_setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, mc.vocab_size, n).tolist() for n in (5, 3)]
    n_new = 3
    reqs = [eng.add_request(p, n_new) for p in prompts]
    eng.run_to_completion(max_steps=50)
    for p, r in zip(prompts, reqs):
        assert r.done
        want = _dense_greedy(eng.params, mc, p, n_new)
        assert r.output == want, (r.output, want)


def test_engine_continuous_batching(engine_setup):
    """Requests arriving mid-flight join running decode batches."""
    mc, cfg, eng = engine_setup
    rng = np.random.default_rng(1)
    first = eng.add_request(rng.integers(0, mc.vocab_size, 6).tolist(), 4)
    eng.step()  # prefill + first token
    eng.step()  # one decode
    late = eng.add_request(rng.integers(0, mc.vocab_size, 4).tolist(), 3)
    eng.run_to_completion(max_steps=50)
    assert first.done and late.done
    assert len(first.output) == 4 and len(late.output) == 3
    # pages released
    assert eng.pool.free_pages == eng.cfg.num_pages
    # cross-check the late request against the oracle
    want = _dense_greedy(eng.params, mc, late.prompt, 3)
    assert late.output == want


def test_engine_queues_beyond_capacity(engine_setup):
    mc, cfg, eng = engine_setup
    rng = np.random.default_rng(2)
    reqs = [
        eng.add_request(rng.integers(0, mc.vocab_size, 4).tolist(), 2)
        for _ in range(6)  # > max_batch
    ]
    eng.run_to_completion(max_steps=100)
    assert all(r.done for r in reqs)
    assert all(len(r.output) == 2 for r in reqs)


def test_engine_eos_stops(engine_setup):
    mc, _, _ = engine_setup
    cfg = EngineConfig(
        model=mc, max_batch=2, num_pages=32, page_size=8, max_seq_len=64,
        greedy=True, interpret=True, eos_token=0,
    )
    eng = LlamaServingEngine(cfg, seed=0)
    rng = np.random.default_rng(3)
    r = eng.add_request(rng.integers(0, mc.vocab_size, 4).tolist(), 12)
    eng.run_to_completion(max_steps=30)
    assert r.done
    if 0 in r.output:
        assert r.output.index(0) == len(r.output) - 1
