"""On-hardware accuracy gate at flagship scale (VERDICT r4 #7).

tests/test_accuracy.py runs the teacher-forced logit-KL gate on
LlamaConfig.tiny() under interpret mode; this script runs the same gate at
1B (and the weight-container comparison at 8B) on the real chip, covering
every quantized container and both alternative decode strategies:

  fp8-KV (calibrated scales)      -> logit KL vs the bf16 engine
  fp8 weights (e4m3 bit decode)   -> logit KL
  int8 weights (linear, _iscale)  -> logit KL
  spec decode (prompt-lookup)     -> greedy token exactness vs base
  decode window (jitted scan x4)  -> greedy token exactness vs base

Zero-egress note: real checkpoints cannot be downloaded here, so weights
are random (seeded) — the KL integrates exactly the quantization noise a
real-checkpoint perplexity delta would. 8B has no single-chip bf16
baseline (16 GB > HBM); at 8B the gate reports int8-weight vs fp8-weight
cross-container KL instead, each generated on device.

Usage: python benchmarks/accuracy_gate.py --model 1b   (one JSON line/row)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _mean_kl(logits_p, logits_q):
    p = _softmax(np.asarray(logits_p, np.float64))
    q = _softmax(np.asarray(logits_q, np.float64))
    return float(np.mean(np.sum(p * (np.log(p + 1e-12) - np.log(q + 1e-12)),
                                axis=-1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b", choices=["tiny", "1b", "8b"])
    ap.add_argument("--prompts", type=int, default=3)
    ap.add_argument("--plen", type=int, default=48)
    ap.add_argument("--new", type=int, default=16)
    args = ap.parse_args()

    import jax

    from flashinfer_tpu.models.llama import LlamaConfig
    from flashinfer_tpu.serving import (
        EngineConfig,
        LlamaServingEngine,
        calibrate_kv_scales,
    )

    presets = {
        "tiny": LlamaConfig.tiny(),
        "1b": LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_layers=16, num_qo_heads=16, num_kv_heads=4, head_dim=128),
        "8b": LlamaConfig.llama3_8b(),
    }
    mc = presets[args.model]
    kw = dict(model=mc, max_batch=args.prompts, num_pages=256, page_size=32,
              max_seq_len=args.plen + args.new + 8, greedy=True)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, mc.vocab_size, args.plen).tolist()
               for _ in range(args.prompts)]

    def emit(config, **fields):
        print(json.dumps({"gate": "accuracy", "model": args.model,
                          "config": config, **fields}), flush=True)

    if args.model == "8b":
        # no single-chip bf16 baseline: compare the two 8-bit weight
        # containers against each other (both seeded identically)
        from flashinfer_tpu.models.llama import (
            llama_init_weights_fp8,
            llama_init_weights_int8,
        )

        e_fp8 = LlamaServingEngine(
            EngineConfig(**kw),
            params=llama_init_weights_fp8(jax.random.key(0), mc), seed=0)
        fp8_logits = [e_fp8.score(p) for p in prompts]
        del e_fp8
        e_int8 = LlamaServingEngine(
            EngineConfig(**kw),
            params=llama_init_weights_int8(jax.random.key(0), mc), seed=0)
        kls = [_mean_kl(r, e_int8.score(p))
               for p, r in zip(prompts, fp8_logits)]
        emit("int8-weight vs fp8-weight", mean_kl=round(float(np.mean(kls)), 5),
             max_kl=round(float(np.max(kls)), 5))
        return

    base = LlamaServingEngine(EngineConfig(**kw), seed=0)
    ref_logits = [base.score(p) for p in prompts]
    base_reqs = [base.add_request(p, args.new) for p in prompts]
    base.run_to_completion(max_steps=args.new * 4 + 16)
    base_out = [r.output for r in base_reqs]
    params = base.params

    # fp8 KV with calibrated scales
    scales = calibrate_kv_scales(EngineConfig(**kw), prompts, params=params)
    eng = LlamaServingEngine(
        EngineConfig(kv_dtype="fp8_e4m3", kv_scale=scales, **kw),
        params=params, seed=0)
    kls = [_mean_kl(r, eng.score(p)) for p, r in zip(prompts, ref_logits)]
    emit("fp8-kv (calibrated)", mean_kl=round(float(np.mean(kls)), 5),
         max_kl=round(float(np.max(kls)), 5),
         k_scale=round(scales[0], 5), v_scale=round(scales[1], 5))
    del eng

    # linear-int8 KV (calibrated amax/127)
    iscales = calibrate_kv_scales(
        EngineConfig(**{**kw, "kv_dtype": "int8"}), prompts, params=params)
    eng = LlamaServingEngine(
        EngineConfig(**{**kw, "kv_dtype": "int8", "kv_scale": iscales}),
        params=params, seed=0)
    kls = [_mean_kl(r, eng.score(p)) for p, r in zip(prompts, ref_logits)]
    emit("int8-kv (calibrated)", mean_kl=round(float(np.mean(kls)), 5),
         max_kl=round(float(np.max(kls)), 5))
    del eng

    # quantized weight containers (quantize the RAW pre-fusion weights:
    # fuse_qkv_weights then concatenates containers + scales itself)
    from flashinfer_tpu.models.llama import (
        llama_init_weights,
        quantize_llama_weights_fp8,
        quantize_llama_weights_int8,
    )

    raw = llama_init_weights(jax.random.key(0), mc)  # == base engine seed
    for name, quant in (("fp8-weight", quantize_llama_weights_fp8),
                        ("int8-weight", quantize_llama_weights_int8)):
        eng = LlamaServingEngine(EngineConfig(**kw), params=quant(raw),
                                 seed=0)
        kls = [_mean_kl(r, eng.score(p)) for p, r in zip(prompts, ref_logits)]
        emit(name, mean_kl=round(float(np.mean(kls)), 5),
             max_kl=round(float(np.max(kls)), 5))
        del eng

    # execution strategies: greedy token-exactness vs the base engine
    for name, ekw in (("spec-decode", dict(spec_tokens=3)),
                      ("decode-window", dict(decode_window=4))):
        eng = LlamaServingEngine(EngineConfig(**kw, **ekw), params=params,
                                 seed=0)
        reqs = [eng.add_request(p, args.new) for p in prompts]
        eng.run_to_completion(max_steps=args.new * 4 + 16)
        match = [r.output == o for r, o in zip(reqs, base_out)]
        emit(name, token_exact=all(match),
             match_fraction=round(float(np.mean(match)), 3))
        del eng


if __name__ == "__main__":
    main()
