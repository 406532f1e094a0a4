"""Headline benchmark: paged decode attention bandwidth vs HBM roofline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The north-star target (BASELINE.md) is >=85% of HBM roofline for the paged
attention kernel; vs_baseline = achieved_fraction / 0.85.

Measurement methodology mirrors the reference (flashinfer/testing/utils.py:
538 bench_gpu_time_with_cuda_event): warmup then median of timed iterations,
achieved bytes computed analytically from the problem shape.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Llama-3-8B decode shapes
BATCH = 64
KV_LEN = 2048
NUM_QO_HEADS = 32
NUM_KV_HEADS = 8
HEAD_DIM = 128
PAGE_SIZE = 32
DTYPE = "bfloat16"
WARMUP = 3
ITERS = 10

# HBM bandwidth roofline by TPU generation (GB/s)
HBM_GBPS = {
    "v5 lite": 819.0,  # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6 lite": 1640.0,  # v6e (trillium)
    "v6e": 1640.0,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.attention.batch import (
        BatchDecodeWithPagedKVCacheWrapper,
    )

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    hbm = next((v for k, v in HBM_GBPS.items() if k in kind), 819.0)
    on_tpu = dev.platform == "tpu"

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    pages_per_req = KV_LEN // PAGE_SIZE
    total_pages = BATCH * pages_per_req + 8
    kv_lens = [KV_LEN] * BATCH
    indptr = np.arange(BATCH + 1) * pages_per_req
    indices = rng.permutation(total_pages)[: indptr[-1]].astype(np.int32)
    last = np.full(BATCH, PAGE_SIZE, np.int32)

    k_cache = jnp.asarray(
        rng.standard_normal((total_pages, NUM_KV_HEADS, PAGE_SIZE, HEAD_DIM)),
        dtype,
    )
    v_cache = jnp.asarray(
        rng.standard_normal((total_pages, NUM_KV_HEADS, PAGE_SIZE, HEAD_DIM)),
        dtype,
    )
    q = jnp.asarray(rng.standard_normal((BATCH, NUM_QO_HEADS, HEAD_DIM)), dtype)

    wrapper = BatchDecodeWithPagedKVCacheWrapper(
        kv_layout="HND", backend="pallas" if on_tpu else "reference"
    )
    wrapper.plan(
        indptr, indices, last, NUM_QO_HEADS, NUM_KV_HEADS, HEAD_DIM, PAGE_SIZE,
        kv_chunk_size=2048,
    )

    # caches must be jit *arguments*: closed-over arrays bake into the HLO
    # as giant constants (and blow up remote-compile payloads)
    run = jax.jit(lambda q, kc, vc: wrapper.run(q, (kc, vc)))
    out = run(q, k_cache, v_cache)
    out.block_until_ready()

    times = []
    for i in range(WARMUP + ITERS):
        t0 = time.perf_counter()
        run(q, k_cache, v_cache).block_until_ready()
        t1 = time.perf_counter()
        if i >= WARMUP:
            times.append(t1 - t0)
    median_s = float(np.median(times))

    # bytes: KV read once + q read + out write (q/out negligible)
    kv_bytes = BATCH * KV_LEN * NUM_KV_HEADS * HEAD_DIM * 2 * 2  # k+v, bf16
    achieved_gbps = kv_bytes / median_s / 1e9
    frac = achieved_gbps / hbm

    print(
        json.dumps(
            {
                "metric": "paged_decode_attention_hbm_roofline_frac",
                "value": round(frac, 4),
                "unit": f"fraction_of_{hbm:.0f}GBps_roofline"
                        f" (median {median_s*1e3:.3f} ms, {achieved_gbps:.1f} GB/s,"
                        f" b{BATCH} kv{KV_LEN} h{NUM_QO_HEADS}/{NUM_KV_HEADS}"
                        f" d{HEAD_DIM} p{PAGE_SIZE} bf16, {kind})",
                "vs_baseline": round(frac / 0.85, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # keep the contract: one JSON line, always
        print(
            json.dumps(
                {
                    "metric": "paged_decode_attention_hbm_roofline_frac",
                    "value": 0.0,
                    "unit": f"error: {type(e).__name__}: {e}"[:400],
                    "vs_baseline": 0.0,
                }
            )
        )
        sys.exit(0)
