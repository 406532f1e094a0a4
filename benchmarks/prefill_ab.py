"""A/B the prefill kernel-body tactics on the attached TPU.

Forces each (h_blk, tile_k, head_loop) candidate by pinning _select_tiles,
times it with the differential bencher, prints one JSON line per tactic.
Used to pick the default heuristic ordering for the head-loop prefill body
(round-3 MFU lever) from real hardware numbers rather than the VMEM model.

Usage: python benchmarks/prefill_ab.py [--b 8 --sq 1024 --hq 16 --hkv 16]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import flashinfer_tpu as fi
from flashinfer_tpu.ops.attention.kernels import paged as paged_mod
from flashinfer_tpu.testing.utils import (
    attention_bytes,
    attention_flops,
    bench_tpu_time_differential,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--sq", type=int, default=1024)
    ap.add_argument("--skv", type=int, default=None)
    ap.add_argument("--hq", type=int, default=16)
    ap.add_argument("--hkv", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--max-tactics", type=int, default=10)
    args = ap.parse_args()
    skv = args.skv or args.sq

    rng = np.random.default_rng(0)
    b, sq, hq, hkv, d = args.b, args.sq, args.hq, args.hkv, args.d

    q0 = jnp.asarray(rng.standard_normal((b * sq, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b * skv, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b * skv, hkv, d)), jnp.bfloat16)

    flops = attention_flops(
        batch_size=b, qo_len=sq, kv_len=skv, head_dim_qk=d, head_dim_vo=d,
        num_qo_heads=hq, causal=True)
    byts = attention_bytes(
        batch_size=b, qo_len=sq, kv_len=skv, head_dim_qk=d, head_dim_vo=d,
        num_qo_heads=hq, num_kv_heads=hkv, q_itemsize=2, kv_itemsize=2,
        o_itemsize=2)

    # Collect the candidate list once by intercepting _select_tiles.
    seen = {}
    orig_select = paged_mod._select_tiles

    def capture(cands, **ctx):
        seen["cands"] = list(cands)
        return orig_select(cands, **ctx)

    paged_mod._select_tiles = capture
    w = fi.BatchPrefillWithRaggedKVCacheWrapper(backend="pallas")
    qo_indptr = np.arange(b + 1) * sq
    kv_indptr = np.arange(b + 1) * skv
    w.plan(qo_indptr, kv_indptr, hq, hkv, d, causal=True)
    jax.block_until_ready(w.run(q0, (k, v)))
    cands = seen["cands"]
    print(f"# candidates: {cands}", flush=True)

    # Row 0: the DEFAULT wrapper path (unpinned heuristic) timed in the SAME
    # session as the pinned tactics — the wrapper-vs-A/B comparison must not
    # straddle sessions/load conditions (VERDICT r4 #2).
    paged_mod._select_tiles = orig_select

    def step_default(q, k, v):
        o = w.run(q, (k, v))
        return q + o[..., :d].astype(q.dtype) * 0.001

    dt0 = bench_tpu_time_differential(
        step_default, q0, k, v, n_short=2, n_long=args.iters + 2)
    print(json.dumps({
        "tactic": "default-heuristic",
        "median_time_ms": round(dt0 * 1e3, 4),
        "tflops": round(flops / dt0 / 1e12, 3),
        "tb_per_sec": round(byts / dt0 / 1e12, 4),
    }), flush=True)

    results = []
    try:
        for cand in cands[: args.max_tactics]:
            paged_mod._select_tiles = lambda c, _cand=cand, **ctx: _cand

            def step(q, k, v):
                o = w.run(q, (k, v))
                return q + o[..., :d].astype(q.dtype) * 0.001

            try:
                dt = bench_tpu_time_differential(
                    step, q0, k, v, n_short=2, n_long=args.iters + 2)
            except Exception as e:  # Mosaic rejection etc.
                print(json.dumps({"tactic": list(cand),
                                  "error": str(e)[:160]}), flush=True)
                continue
            row = {
                "tactic": list(cand),
                "median_time_ms": round(dt * 1e3, 4),
                "tflops": round(flops / dt / 1e12, 3),
                "tb_per_sec": round(byts / dt / 1e12, 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    finally:
        paged_mod._select_tiles = orig_select
    if results:
        best = min(results, key=lambda r: r["median_time_ms"])
        print("# BEST:", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
