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


def test_engine_fp8_weights():
    """FP8 e4m3 weights (int8 bits + per-channel scales): the engine runs
    end to end and its greedy tokens track the bf16-weight engine (e4m3
    round-trip error permitting; BASELINE config 3 weight path)."""
    import numpy as np
    from flashinfer_tpu.models.llama import (
        LlamaConfig,
        llama_init_weights,
        quantize_llama_weights_fp8,
    )

    mc = LlamaConfig.tiny()
    cfg16 = EngineConfig(model=mc, max_batch=2, num_pages=32, page_size=8,
                         max_seq_len=64, greedy=True, interpret=True)
    cfg8 = EngineConfig(model=mc, max_batch=2, num_pages=32, page_size=8,
                        max_seq_len=64, greedy=True, interpret=True,
                        weight_dtype="fp8_e4m3")
    e16 = LlamaServingEngine(cfg16, seed=3)
    e8 = LlamaServingEngine(cfg8, seed=3)
    # quantized weights really are int8 bits (wq/wk/wv fused to wqkv)
    assert e8.params["wqkv"].dtype == jnp.int8
    assert "wqkv_scale" in e8.params

    r16 = e16.add_request([5, 6, 7, 8], 6)
    r8 = e8.add_request([5, 6, 7, 8], 6)
    e16.run_to_completion()
    e8.run_to_completion()
    assert len(r8.output) == 6
    # weight round-trip: dequantized weights close to the originals
    from flashinfer_tpu.ops.fp8 import e4m3_bits_to_bf16
    w16 = np.asarray(llama_init_weights(jax.random.key(3), mc)["wq"],
                     np.float32)
    nq = mc.num_qo_heads * mc.head_dim  # wq slice of the fused wqkv
    w8 = np.asarray(
        e4m3_bits_to_bf16(e8.params["wqkv"][:, :, :nq]), np.float32
    ) * np.asarray(e8.params["wqkv_scale"][:, :, :nq], np.float32)
    rel = np.abs(w8 - w16).max() / np.abs(w16).max()
    assert rel < 0.08, rel


def test_engine_int8_weights():
    """LINEAR int8 weights (TPU-native 8-bit container; one hardware
    convert per operand read vs the e4m3 bit decode): runs end to end,
    tighter round-trip than e4m3, and greedy tokens track bf16."""
    import numpy as np
    from flashinfer_tpu.models.llama import (
        LlamaConfig,
        llama_init_weights,
    )

    mc = LlamaConfig.tiny()
    kw = dict(model=mc, max_batch=2, num_pages=32, page_size=8,
              max_seq_len=64, greedy=True, interpret=True)
    e16 = LlamaServingEngine(EngineConfig(**kw), seed=3)
    ei8 = LlamaServingEngine(
        EngineConfig(weight_dtype="int8", **kw), seed=3)
    assert ei8.params["wqkv"].dtype == jnp.int8
    assert "wqkv_iscale" in ei8.params and "wqkv_scale" not in ei8.params

    r16 = e16.add_request([5, 6, 7, 8], 6)
    ri8 = ei8.add_request([5, 6, 7, 8], 6)
    e16.run_to_completion()
    ei8.run_to_completion()
    assert len(ri8.output) == 6
    assert ri8.output[:2] == r16.output[:2]  # early greedy tokens agree
    # per-channel int8 round-trip is tighter than e4m3 (<=0.5/127 ~ 0.4%)
    w16 = np.asarray(llama_init_weights(jax.random.key(3), mc)["wq"],
                     np.float32)
    nq = mc.num_qo_heads * mc.head_dim
    wq = (np.asarray(ei8.params["wqkv"][:, :, :nq], np.float32)
          * np.asarray(ei8.params["wqkv_iscale"][:, :, :nq], np.float32))
    rel = np.abs(wq - w16).max() / np.abs(w16).max()
    assert rel < 0.005, rel


def test_llama_init_weights_int8_matches_quantizer():
    """On-device int8 generation == quantize(bf16 init) in scheme (scale
    keys, dtypes, shapes); values differ only by the f32-vs-bf16 source."""
    from flashinfer_tpu.models.llama import (
        LlamaConfig,
        llama_init_weights_int8,
    )

    mc = LlamaConfig.tiny()
    p = llama_init_weights_int8(jax.random.key(0), mc)
    for name in ("wq", "wk", "wv", "wo", "w_gate_up", "w_down", "lm_head"):
        assert p[name].dtype == jnp.int8
        s = p[name + "_iscale"]
        assert s.dtype == jnp.float32
        assert s.shape[-2] == 1 and s.shape[-1] == p[name].shape[-1]
        assert int(jnp.max(jnp.abs(p[name].astype(jnp.int32)))) <= 127
    assert p["embedding"].dtype == mc.dtype


@pytest.mark.parametrize("kv_dtype", ["model", "fp8_e4m3", "int8"])
def test_engine_hnd_layout_token_exact(kv_dtype):
    """kv_layout="HND" (head-sliceable cache -> head-group DMAs + the
    head-loop prefill body on hardware) produces the same tokens as the
    default NHD engine — and, for bf16, the dense oracle."""
    mc = LlamaConfig.tiny()
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, mc.vocab_size, n).tolist() for n in (6, 4)]
    outs = {}
    for layout in ("NHD", "HND"):
        cfg = EngineConfig(
            model=mc, max_batch=4, num_pages=64, page_size=8,
            max_seq_len=128, greedy=True, interpret=True, kv_layout=layout,
            kv_dtype=kv_dtype, kv_scale=0.3,
        )
        eng = LlamaServingEngine(cfg, seed=0)
        reqs = [eng.add_request(p, 3) for p in prompts]
        eng.run_to_completion(max_steps=50)
        outs[layout] = [r.output for r in reqs]
    assert outs["HND"] == outs["NHD"], outs
    if kv_dtype == "model":
        eng_params = LlamaServingEngine(
            EngineConfig(model=mc, max_batch=4, num_pages=64, page_size=8,
                         max_seq_len=128, greedy=True, interpret=True),
            seed=0).params
        for p, got in zip(prompts, outs["HND"]):
            assert got == _dense_greedy(eng_params, mc, p, 3)


def test_engine_decode_window_token_exact():
    """EngineConfig.decode_window (N pre-planned decode steps in one jitted
    lax.scan with on-device token feedback) emits exactly the step-by-step
    engine's greedy tokens — including across the capacity/split bucket
    growth as kv crosses chunk boundaries."""
    mc = LlamaConfig.tiny()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, mc.vocab_size, n).tolist() for n in (9, 5, 2)]
    n_new = 7  # not a multiple of the window: exercises the budget cap
    outs = {}
    for window in (1, 3):
        cfg = EngineConfig(
            model=mc, max_batch=4, num_pages=64, page_size=8,
            max_seq_len=128, greedy=True, interpret=True,
            decode_window=window,
        )
        eng = LlamaServingEngine(cfg, seed=0)
        reqs = [eng.add_request(p, n_new) for p in prompts]
        eng.run_to_completion(max_steps=50)
        assert all(r.done for r in reqs)
        assert eng.pool.free_pages == cfg.num_pages  # no leaked pages
        outs[window] = [r.output for r in reqs]
    assert outs[3] == outs[1], outs
    # windowed steps emit up to window tokens per request per step
    assert all(len(o) == n_new for o in outs[3])


def test_engine_decode_window_eos_rollback():
    """A mid-window eos discards the overrun tokens and rolls the KV tail
    back, leaving the pool clean and the output eos-terminated."""
    mc = LlamaConfig.tiny()
    rng = np.random.default_rng(12)
    prompt = rng.integers(0, mc.vocab_size, 4).tolist()
    outs = {}
    for window in (1, 4):
        cfg = EngineConfig(
            model=mc, max_batch=2, num_pages=32, page_size=8,
            max_seq_len=64, greedy=True, interpret=True, eos_token=0,
            decode_window=window,
        )
        eng = LlamaServingEngine(cfg, seed=0)
        r = eng.add_request(prompt, 12)
        eng.run_to_completion(max_steps=30)
        assert r.done
        if 0 in r.output:
            assert r.output.index(0) == len(r.output) - 1
        assert eng.pool.free_pages == cfg.num_pages
        outs[window] = r.output
    assert outs[4] == outs[1], outs


@pytest.mark.parametrize("mode", ["decode", "window", "spec"])
def test_engine_preemption_token_exact(mode):
    """Oversubscribed KV pool: decode-time pool exhaustion evicts the
    youngest sequence and requeues it (recompute preemption, the
    vLLM/SGLang contract) instead of raising. Every request still
    completes, greedy output is token-exact vs a roomy pool, and no
    pages leak."""
    mc = LlamaConfig.tiny()
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, mc.vocab_size, 6).tolist() for _ in range(3)]
    n_new = 10  # each request grows to 16 tokens = 2 pages of 8
    kw = {}
    if mode == "window":
        kw["decode_window"] = 3
    elif mode == "spec":
        kw["spec_tokens"] = 2
    outs = {}
    for pages in (64, 5):  # roomy vs oversubscribed (3*2=6 pages needed)
        cfg = EngineConfig(
            model=mc, max_batch=3, num_pages=pages, page_size=8,
            max_seq_len=32, greedy=True, interpret=True, **kw,
        )
        eng = LlamaServingEngine(cfg, seed=0)
        reqs = [eng.add_request(p, n_new) for p in prompts]
        eng.run_to_completion(max_steps=300)
        assert all(r.done for r in reqs), [r.done for r in reqs]
        assert eng.pool.free_pages == cfg.num_pages  # nothing leaked
        if pages == 5:
            assert eng.preemptions > 0, "pool was not actually oversubscribed"
        outs[pages] = [r.output for r in reqs]
    assert outs[5] == outs[64], (outs[5], outs[64])


def test_engine_single_sequence_exceeding_pool_raises():
    """One sequence alone larger than the whole pool is a config error,
    not scheduling pressure — admit fails fast instead of spinning."""
    mc = LlamaConfig.tiny()
    cfg = EngineConfig(
        model=mc, max_batch=2, num_pages=2, page_size=8,
        max_seq_len=32, greedy=True, interpret=True,
    )
    eng = LlamaServingEngine(cfg, seed=0)
    eng.add_request(list(range(20)), 4)  # needs 3 pages at admission
    with pytest.raises(ValueError, match="never"):
        eng.step()
