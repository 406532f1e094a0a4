"""Benchmark CLI — measure any routine on the attached device.

Reference parity: benchmarks/flashinfer_benchmark.py + benchmarks/routines/
(attention/gemm/moe/sampling routines, median-of-N methodology,
benchmarks/README.md:45).  Timing uses the differential-scan bencher
(flashinfer_tpu/testing/utils.py) which cancels dispatch latency — the
TPU stand-in for CUDA-event/CUDA-graph timing.

Examples:
  python benchmarks/flashinfer_tpu_benchmark.py --routine BatchDecodeWithPagedKVCacheWrapper \
      --batch-size 64 --s-kv 2048 --num-qo-heads 32 --num-kv-heads 8 --head-dim 128
  python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
      --batch-size 16 --s-qo 1024 --s-kv 1024 --num-qo-heads 128 --num-kv-heads 128 \
      --head-dim 192 --head-dim-vo 128 --causal
  python benchmarks/flashinfer_tpu_benchmark.py --routine gemm --m 4096 --n 4096 --k 4096
  python benchmarks/flashinfer_tpu_benchmark.py --routine sampling --batch-size 256 --vocab 128256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# allow running as `python benchmarks/flashinfer_tpu_benchmark.py` from a
# source checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_attention(args) -> dict:
    import jax
    import jax.numpy as jnp

    import flashinfer_tpu as fi
    from flashinfer_tpu.testing.utils import (
        attention_bytes,
        attention_flops,
        bench_tpu_time_differential,
    )

    rng = np.random.default_rng(0)
    dtype = jnp.dtype(args.dtype)
    b, sq, skv = args.batch_size, args.s_qo, args.s_kv
    hq, hkv, d = args.num_qo_heads, args.num_kv_heads, args.head_dim
    dv = args.head_dim_vo or d
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "reference"

    if args.routine == "BatchPrefillWithRaggedKVCacheWrapper":
        w = fi.BatchPrefillWithRaggedKVCacheWrapper(backend=backend)
        qo_indptr = np.arange(b + 1) * sq
        kv_indptr = np.arange(b + 1) * skv
        w.plan(qo_indptr, kv_indptr, hq, hkv, d, head_dim_vo=dv,
               causal=args.causal)
        q0 = jnp.asarray(rng.standard_normal((b * sq, hq, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b * skv, hkv, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b * skv, hkv, dv)), dtype)

        def step(q, k, v):
            o = w.run(q, (k, v))
            return q + o[..., :d].astype(dtype) * 0.001

        dt = bench_tpu_time_differential(step, q0, k, v,
                                         n_short=2, n_long=args.iters + 2)
        qo_len, kv_len = sq, skv
    else:
        ps = args.page_size
        pages = -(-skv // ps)
        indptr = np.arange(b + 1) * pages
        indices = rng.permutation(b * pages + 8)[: b * pages].astype(np.int32)
        last = np.full(b, ((skv - 1) % ps) + 1, np.int32)
        layout = args.kv_layout
        cshape = ((b * pages + 8, hkv, ps, d) if layout == "HND"
                  else (b * pages + 8, ps, hkv, d))
        kc = jnp.asarray(rng.standard_normal(cshape), dtype)
        vc = jnp.asarray(rng.standard_normal(cshape), dtype)
        if args.routine == "BatchDecodeWithPagedKVCacheWrapper":
            w = fi.BatchDecodeWithPagedKVCacheWrapper(
                backend=backend, kv_layout=layout)
            w.plan(indptr, indices, last, hq, hkv, d, ps,
                   kv_chunk_size=args.kv_chunk_size)
            q0 = jnp.asarray(rng.standard_normal((b, hq, d)), dtype)
            qo_len = 1
        else:
            w = fi.BatchPrefillWithPagedKVCacheWrapper(backend=backend)
            qo_indptr = np.arange(b + 1) * sq
            w.plan(qo_indptr, indptr, indices, last, hq, hkv, d, ps,
                   causal=args.causal)
            q0 = jnp.asarray(rng.standard_normal((b * sq, hq, d)), dtype)
            qo_len = sq
        kv_len = skv

        def step(q, kc, vc):
            o = w.run(q, (kc, vc))
            return q + o.astype(dtype) * 0.001

        dt = bench_tpu_time_differential(step, q0, kc, vc,
                                         n_short=2, n_long=args.iters + 2)

    flops = attention_flops(
        batch_size=b, qo_len=qo_len, kv_len=kv_len, head_dim_qk=d,
        head_dim_vo=dv, num_qo_heads=hq, causal=args.causal)
    byts = attention_bytes(
        batch_size=b, qo_len=qo_len, kv_len=kv_len, head_dim_qk=d,
        head_dim_vo=dv, num_qo_heads=hq, num_kv_heads=hkv,
        q_itemsize=dtype.itemsize, kv_itemsize=dtype.itemsize,
        o_itemsize=dtype.itemsize)
    return {
        "routine": args.routine,
        "median_time_ms": round(dt * 1e3, 4),
        "tflops": round(flops / dt / 1e12, 3),
        "tb_per_sec": round(byts / dt / 1e12, 4),
    }


def bench_gemm(args) -> dict:
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.testing.utils import bench_tpu_time_differential, gemm_flops

    rng = np.random.default_rng(0)
    dtype = jnp.dtype(args.dtype)
    a0 = jnp.asarray(rng.standard_normal((args.m, args.k)), dtype)
    bmat = jnp.asarray(rng.standard_normal((args.k, args.n)), dtype)

    def step(a, bm):
        c = jnp.dot(a, bm, preferred_element_type=jnp.float32)
        return a + c[:, : args.k].astype(dtype) * 0.001 if args.n >= args.k \
            else a * 1.0 + jnp.sum(c, axis=1, keepdims=True).astype(dtype) * 0.001

    dt = bench_tpu_time_differential(step, a0, bmat,
                                     n_short=2, n_long=args.iters + 2)
    return {
        "routine": "gemm",
        "median_time_ms": round(dt * 1e3, 4),
        "tflops": round(gemm_flops(args.m, args.n, args.k) / dt / 1e12, 3),
    }


def bench_moe(args) -> dict:
    """Fused-MoE layer throughput (reference benchmarks/routines moe).
    --m tokens, --k hidden, --inter intermediate, Mixtral-8x7B layer by
    default. --moe-backend pallas runs the tile-aligned grouped GEMM with
    in-kernel fp8 dequant; xla is the ragged_dot path."""
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.fused_moe import fused_moe, route_tokens
    from flashinfer_tpu.testing.utils import bench_tpu_time_differential

    if args.weight_dtype not in ("model", "fp8_e4m3"):
        # don't silently bench bf16 while reporting another dtype
        raise SystemExit(
            f"bench_moe supports --weight-dtype model|fp8_e4m3, "
            f"got {args.weight_dtype!r}")
    rng = np.random.default_rng(0)
    m, hidden, inter = args.m, args.k, args.inter
    e, top_k = args.num_experts, args.top_k
    x0 = jnp.asarray(rng.standard_normal((m, hidden)), jnp.bfloat16)
    w13 = jnp.asarray(
        rng.standard_normal((e, 2 * inter, hidden)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(
        rng.standard_normal((e, hidden, inter)) * 0.05, jnp.bfloat16)
    logits = jnp.asarray(rng.standard_normal((m, e)), jnp.float32)
    ids, scales = route_tokens(logits, top_k)
    s13 = s2 = None
    if args.weight_dtype == "fp8_e4m3":
        def q(w):
            return jax.lax.bitcast_convert_type(
                (w.astype(jnp.float32) / 0.05).astype(jnp.float8_e4m3fn),
                jnp.int8,
            )

        s13 = jnp.full((e,), 0.05, jnp.float32)
        s2 = jnp.full((e,), 0.05, jnp.float32)
        w13, w2 = q(w13), q(w2)

    # weights MUST be bench args, not closure captures: closure capture
    # embeds them as HLO constants (2.8 GB here), which the tunneled
    # remote-compile transport cannot carry (observed 30-min compile hang)
    def step(x, ids, scales, w13, w2):
        out = fused_moe(
            x, w13, w2, ids, scales, w13_scale=s13, w2_scale=s2,
            backend=args.moe_backend, out_dtype=jnp.bfloat16,
        )
        return x + out * jnp.bfloat16(1e-3)

    dt = bench_tpu_time_differential(
        step, x0, ids, scales, w13, w2, n_short=2, n_long=args.iters + 2)
    flops = 2 * m * top_k * 3 * inter * hidden  # gate+up+down mats
    wbytes = e * 3 * inter * hidden * (1 if s13 is not None else 2)
    return {
        "routine": "moe",
        "backend": args.moe_backend,
        "weight_dtype": args.weight_dtype,
        "median_time_ms": round(dt * 1e3, 4),
        "tflops": round(flops / dt / 1e12, 3),
        "weight_tb_per_sec": round(wbytes / dt / 1e12, 4),
    }


def _mla_setup(args, rng):
    """Arrays + planned wrapper + step closure for one MLA bench mode."""
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper

    b, skv, h, ps = (args.batch_size, args.s_kv, args.num_qo_heads,
                     args.page_size)
    dckv, dkpe = 512, 64
    pages = -(-skv // ps)
    indptr = np.arange(b + 1) * pages
    indices = rng.permutation(b * pages + 8)[: b * pages].astype(np.int32)
    kv_lens = np.full(b, skv, np.int32)
    fp8 = args.kv_dtype == "fp8_e4m3"
    int8 = args.kv_dtype == "int8"
    ckv = jnp.asarray(
        rng.standard_normal((b * pages + 8, ps, dckv)), jnp.bfloat16)
    # kpe stored 128-padded (the wrapper's zero-copy fast path)
    kpe = jnp.asarray(
        np.pad(rng.standard_normal((b * pages + 8, ps, dkpe)),
               ((0, 0), (0, 0), (0, 64))), jnp.bfloat16)
    scale = 1.0
    if fp8:
        scale = 0.05

        def q8(x):
            return jax.lax.bitcast_convert_type(
                (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn),
                jnp.int8)
        ckv, kpe = q8(ckv), q8(kpe)
    elif int8:
        scale = 4.0 / 127.0  # linear int8, per-tensor amax/127

        def qi(x):
            return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                            -127, 127).astype(jnp.int8)
        ckv, kpe = qi(ckv), qi(kpe)
    qn = jnp.asarray(rng.standard_normal((b, h, dckv)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((b, h, dkpe)), jnp.bfloat16)

    w = BatchMLAPagedAttentionWrapper(backend="pallas", tile_k=args.tile_k)
    w.plan(np.arange(b + 1), indptr, indices, kv_lens, h, dckv, dkpe, ps)

    def step(qn, qp, ckv, kpe):
        o = w.run(qn, qp, ckv, kpe, ckv_scale=scale, kpe_scale=scale,
                  cache_dtype="int8" if int8 else "e4m3")
        return qn + o.astype(qn.dtype) * jnp.bfloat16(1e-3)

    return {"step": step, "args": (qn, qp, ckv, kpe)}


def bench_mla(args) -> dict:
    """MLA paged decode (DeepSeek config: dckv 512 + dkpe 64, matrix-
    absorbed; reference trtllm_batch_decode_with_kv_cache_mla role).
    --batch-size requests, --s-kv context, --num-qo-heads heads,
    --kv-dtype fp8_e4m3 for the int8-container e4m3 cache decode."""
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper
    from flashinfer_tpu.testing.utils import bench_tpu_time_differential

    rng = np.random.default_rng(0)
    b, skv, h, ps = args.batch_size, args.s_kv, args.num_qo_heads, args.page_size
    dckv, dkpe = 512, 64
    pages = -(-skv // ps)
    indptr = np.arange(b + 1) * pages
    indices = rng.permutation(b * pages + 8)[: b * pages].astype(np.int32)
    kv_lens = np.full(b, skv, np.int32)
    if args.kv_dtype == "all":
        # Chip/session speed drifts ~2x across processes through the
        # tunnel; ALTERNATING same-process measurement is the only
        # trustworthy dtype ratio (PERF.md methodology). Build each mode's
        # jitted scan pair once, interleave timings, min per mode.
        import time as _time

        import jax

        # long scans + min-of-3 per length per round: the tunnel's multi-ms
        # dispatch jitter otherwise swamps the short-kernel differential
        # (observed: 0.0-ms rows when t_long-t_short went negative)
        n_s, n_l = 4, 64
        modes = ["model", "fp8_e4m3", "int8"]
        runs = {}
        for m in modes:
            sub = argparse.Namespace(**{**vars(args), "kv_dtype": m})
            mr = _mla_setup(sub, rng)
            fs = {n: jax.jit(
                lambda c, *inv, _f=mr["step"], _n=n: jax.lax.scan(
                    lambda cc, _: (_f(cc, *inv), ()), c, None, length=_n
                )[0]) for n in (n_s, n_l)}
            for n in (n_s, n_l):  # compile + warm
                jax.block_until_ready(fs[n](*mr["args"]))
            runs[m] = (fs, mr["args"])
        best = {m: float("inf") for m in modes}
        for _round in range(4):
            for m in modes:
                fs, a = runs[m]
                ts = {}
                for n in (n_s, n_l):
                    tt = []
                    for _ in range(3):
                        t0 = _time.perf_counter()
                        jax.block_until_ready(fs[n](*a))
                        tt.append(_time.perf_counter() - t0)
                    ts[n] = min(tt)
                dt = max((ts[n_l] - ts[n_s]) / (n_l - n_s), 1e-9)
                best[m] = min(best[m], dt * 1e3)
        out = {"routine": "mla", "kv_dtype": "all(interleaved)"}
        for m in modes:
            phys = b * skv * (dckv + dkpe) * (1 if m != "model" else 2)
            out[m] = {
                "median_time_ms": round(best[m], 4),
                "kv_gb_per_sec_physical": round(
                    phys / (best[m] / 1e3) / 1e9, 1),
            }
        bf = best["model"]
        out["fp8_vs_bf16_physical"] = round(0.5 * bf / best["fp8_e4m3"], 3)
        out["int8_vs_bf16_physical"] = round(0.5 * bf / best["int8"], 3)
        return out
    fp8 = args.kv_dtype == "fp8_e4m3"
    int8 = args.kv_dtype == "int8"
    mr = _mla_setup(args, rng)
    dt = bench_tpu_time_differential(mr["step"], *mr["args"],
                                     n_short=2, n_long=args.iters + 2)
    kv_bytes = b * skv * (dckv + dkpe) * (1 if (fp8 or int8) else 2)
    eff_bytes = b * skv * (dckv + dkpe) * 2  # bf16-equivalent logical bytes
    return {
        "routine": "mla",
        "kv_dtype": args.kv_dtype,
        "median_time_ms": round(dt * 1e3, 4),
        "kv_gb_per_sec_physical": round(kv_bytes / dt / 1e9, 1),
        "kv_gb_per_sec_effective": round(eff_bytes / dt / 1e9, 1),
    }


def bench_sampling(args) -> dict:
    import jax
    import jax.numpy as jnp

    import flashinfer_tpu as fi
    from flashinfer_tpu.testing.utils import bench_tpu_time_differential

    rng = np.random.default_rng(0)
    logits0 = jnp.asarray(
        rng.standard_normal((args.batch_size, args.vocab)), jnp.float32)
    key = jax.random.key(0)

    def step(logits, key):
        probs = fi.softmax(logits)
        tok = fi.top_k_top_p_sampling_from_probs(probs, key, 40, 0.9)
        return logits + tok[:, None].astype(jnp.float32) * 1e-9

    dt = bench_tpu_time_differential(step, logits0, key,
                                     n_short=2, n_long=args.iters + 2)
    toks = args.batch_size / dt
    return {
        "routine": "sampling",
        "median_time_ms": round(dt * 1e3, 4),
        "samples_per_sec": round(toks, 1),
    }


def bench_serving(args) -> dict:
    """Continuous-batching decode throughput (BASELINE.md tokens/sec/chip
    north star). Note: per-step host planning + dispatch ride the tunnel's
    multi-ms latency in this dev environment; steady-state device time per
    token is far lower (see the attention routine)."""
    import time

    import jax
    import numpy as np

    from flashinfer_tpu.models.llama import LlamaConfig
    from flashinfer_tpu.serving import EngineConfig, LlamaServingEngine

    presets = {
        "tiny": LlamaConfig.tiny(),
        "1b": LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_layers=16, num_qo_heads=16, num_kv_heads=4, head_dim=128),
        "8b": LlamaConfig.llama3_8b(),
    }
    mc = presets[args.model]
    # int8 e4m3 KV containers need page_size >= the 32-row int8 VMEM
    # sublane tile on real TPUs; the engine refuses smaller pages
    ps = args.page_size
    if args.kv_dtype in ("fp8_e4m3", "int8") and ps < 32:
        ps = 32
    cfg = EngineConfig(
        model=mc, max_batch=args.batch_size, num_pages=args.num_pages,
        page_size=ps, max_seq_len=args.s_kv, greedy=True,
        kv_dtype=args.kv_dtype,
        weight_dtype=args.weight_dtype,
        kv_layout=args.kv_layout,
        decode_window=args.decode_window,
    )
    params = None
    if args.model == "8b" and args.weight_dtype in ("fp8_e4m3", "int8"):
        # 16 GB of bf16 weights would neither fit the chip nor survive the
        # tunnel upload: generate + quantize per layer ON DEVICE
        if args.weight_dtype == "int8":
            from flashinfer_tpu.models.llama import llama_init_weights_int8
            params = llama_init_weights_int8(jax.random.key(0), mc)
        else:
            from flashinfer_tpu.models.llama import llama_init_weights_fp8
            params = llama_init_weights_fp8(jax.random.key(0), mc)
        cfg.weight_dtype = "model"  # already quantized
    eng = LlamaServingEngine(cfg, params=params, seed=0)
    rng = np.random.default_rng(0)
    for _ in range(args.batch_size):
        eng.add_request(
            rng.integers(0, mc.vocab_size, args.s_qo).tolist(),
            (args.iters + 8) * max(1, args.decode_window))
    eng.step()  # prefill + compiles
    for _ in range(2):
        eng.step()  # decode warm (compile)
    t0 = time.perf_counter()
    n0 = eng.generated_tokens
    for _ in range(args.iters):
        eng.step()
    dt = time.perf_counter() - t0
    toks = eng.generated_tokens - n0

    device_step_ms = None
    if args.device_step:
        # pure DEVICE time per decode step (differential scan) — strips the
        # tunnel dispatch + host planning that dominate ms_per_step here.
        # Reuses the warm engine's plan/blob: same shapes the loop runs.
        device_step_ms = round(_time_device_decode_step(eng) * 1e3, 3)
    if args.trace_dir:
        from flashinfer_tpu.profiler import profile_trace, summarize_trace

        with profile_trace(args.trace_dir):
            for _ in range(4):
                eng.step()
            import jax as _jax

            _jax.block_until_ready(eng.k_cache)
        for row in summarize_trace(args.trace_dir, top=24):
            print("TRACE", row, flush=True)
    # p50 TTFT (warm): run fresh prompts through the warmed engine and time
    # enqueue -> first emitted token (BASELINE.md p50 TTFT row)
    ttfts = []
    for _ in range(5):
        eng2_req = eng.add_request(
            rng.integers(0, mc.vocab_size, args.s_qo).tolist(), 1)
        t1 = time.perf_counter()
        while not eng2_req.output:
            eng.step()
        ttfts.append(time.perf_counter() - t1)
    ttft_p50 = float(np.median(ttfts))
    out = {
        "routine": "serving",
        "model": args.model,
        "tokens_per_sec": round(toks / dt, 1),
        "ttft_p50_ms": round(ttft_p50 * 1e3, 2),
        "ms_per_step": round(dt / args.iters * 1e3, 2),
        "batch": args.batch_size,
        "kv_layout": args.kv_layout,
    }
    if device_step_ms is not None:
        out["device_step_ms"] = device_step_ms
        out["device_tokens_per_sec"] = round(
            args.batch_size / (device_step_ms / 1e3), 1)
    return out


def _time_device_decode_step(eng) -> float:
    """Differential-scan time of ONE jitted decode step (seconds), using
    the warm engine's live plan + per-step blob — the number to compare
    against the weight-read roofline (docs/PERF.md device-step rows)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flashinfer_tpu.serving.engine import _decode_step
    from flashinfer_tpu.testing.utils import bench_tpu_time_differential

    mc, cfg = eng.cfg.model, eng.cfg
    reqs = [r for r in eng._slots if r is not None]
    assert reqs, "engine must have running sequences"
    full_indptr, slot_indices, full_last, kv_lens = eng._slot_tables(reqs)
    B = cfg.max_batch
    tokens = np.zeros(B, np.int64)
    positions = np.zeros(B, np.int32)
    valid = np.zeros(B, bool)
    for r in reqs:
        s = r._slot
        tokens[s] = r.output[-1] if r.output else r.prompt[-1]
        positions[s] = kv_lens[s] - 1
        valid[s] = True
    eng._decode_wrapper.plan(
        full_indptr, slot_indices, full_last,
        mc.num_qo_heads, mc.num_kv_heads, mc.head_dim, cfg.page_size,
        kv_len_arr=kv_lens, kv_chunk_size=eng._kv_chunk(),
        work_capacity=eng._decode_capacity(kv_lens),
    )
    blob = jnp.asarray(np.concatenate([
        tokens.astype(np.int32), positions.astype(np.int32),
        valid.astype(np.int32), slot_indices.astype(np.int32),
        full_indptr.astype(np.int32), full_last.astype(np.int32),
    ]))
    dplan = eng._decode_wrapper.device_plan
    key = eng._next_key()
    sargs = eng._sample_args()

    def step(carry, params, blob, dplan, key, sargs):
        kc, vc, dep = carry
        toks, kc, vc = _decode_step(
            params, mc, cfg.page_size, eng._page_bucket, kc, vc, blob,
            dplan, key, sargs, interpret=eng._interpret, greedy=cfg.greedy,
            kv_fp8=eng._kv_fp8, kv_scale=eng._kv_scale,
            kv_layout=cfg.kv_layout,
        )
        # chain the sampled tokens so the lm_head/sampler aren't DCE'd
        return kc, vc, dep + jnp.sum(toks).astype(jnp.float32) * 1e-30

    dt = bench_tpu_time_differential(
        step, (eng.k_cache, eng.v_cache, jnp.float32(0.0)),
        eng.params, blob, dplan, key, sargs,
        n_short=2, n_long=10, repeats=3,
    )
    return dt


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="flashinfer_tpu benchmark CLI")
    p.add_argument("--routine", required=True, choices=[
        "BatchDecodeWithPagedKVCacheWrapper",
        "BatchPrefillWithPagedKVCacheWrapper",
        "BatchPrefillWithRaggedKVCacheWrapper",
        "gemm", "sampling", "serving", "moe", "mla",
    ])
    p.add_argument("--model", default="1b", choices=["tiny", "1b", "8b"])
    p.add_argument("--kv-dtype", default="model",
                   choices=["model", "fp8_e4m3", "int8", "all"])
    p.add_argument("--tile-k", type=int, default=None,
                   help="pin the kernel kv tile (mla routine)")
    p.add_argument("--weight-dtype", default="model",
                   choices=["model", "fp8_e4m3", "int8"])
    p.add_argument("--num-pages", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--s-qo", type=int, default=128)
    p.add_argument("--s-kv", type=int, default=1024)
    p.add_argument("--num-qo-heads", type=int, default=32)
    p.add_argument("--num-kv-heads", type=int, default=8)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--head-dim-vo", type=int, default=0)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--causal", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--vocab", type=int, default=128256)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--num-experts", type=int, default=8)
    p.add_argument("--top-k", type=int, default=2)
    p.add_argument("--inter", type=int, default=14336)
    p.add_argument("--moe-backend", default="pallas",
                   choices=["pallas", "xla"])
    p.add_argument("--kv-layout", default="NHD", choices=["NHD", "HND"])
    p.add_argument("--kv-chunk-size", type=int, default=None,
                   help="pin the planner kv chunk (attention routines)")
    p.add_argument("--decode-window", type=int, default=1,
                   help="serving: N decode steps per jitted launch "
                        "(multi-step scheduling; amortizes host planning)")
    p.add_argument("--device-step", action="store_true",
                   help="serving: also time the pure jitted decode step "
                        "(differential scan, strips tunnel dispatch)")
    p.add_argument("--trace-dir", default=None,
                   help="serving: capture a 4-step trace and print the "
                        "summarize_trace per-op decomposition")
    args = p.parse_args(argv)

    if args.routine == "gemm":
        out = bench_gemm(args)
    elif args.routine == "sampling":
        out = bench_sampling(args)
    elif args.routine == "serving":
        out = bench_serving(args)
    elif args.routine == "mla":
        out = bench_mla(args)
    elif args.routine == "moe":
        out = bench_moe(args)
    else:
        out = bench_attention(args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
