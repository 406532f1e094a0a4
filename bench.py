"""Headline benchmark: paged decode attention bandwidth vs measured roofline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The north-star target (BASELINE.md) is >=85% of HBM roofline for the paged
attention kernel; vs_baseline = achieved_fraction / 0.85.

Methodology notes:
  * The roofline is MEASURED in-situ (a Pallas streaming copy on the same
    device) rather than taken from spec sheets — the dev environment tunnels
    to a heavily de-rated TPU slice where nominal numbers are meaningless;
    on real v5e/v5p the measured copy approaches the published HBM BW, so
    the fraction is comparable across environments.
  * Timing uses data-dependency chaining + a device-to-host sync: through
    the tunnel, block_until_ready() returns before execution finishes, so
    per-call wall timing lies. (Reference analogue: CUDA-event timing,
    flashinfer/testing/utils.py:538.)
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
ITERS = 8


def _timeit_chained(step, x0, iters=ITERS):
    """Median-free chained timing: serialize iterations through a data
    dependency, then force a real sync with a D2H scalar fetch."""
    x = step(x0)
    _ = np.asarray(x.ravel()[0])  # warm + drain
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = step(x)
    _ = np.asarray(x.ravel()[0])
    return (time.perf_counter() - t0) / iters


def _measure_copy_roofline(nbytes_hint: int = 128 * 1024 * 1024) -> float:
    """Streaming read+write bandwidth (bytes/s) of a big-block Pallas copy."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = nbytes_hint // 2 // 128
    blk = 16384  # 4MB blocks
    rows = (rows // blk) * blk
    x = jnp.zeros((rows, 128), jnp.bfloat16)

    def k_copy(xr, yr):
        yr[:] = xr[:] * jnp.bfloat16(1.0000001)

    f = jax.jit(
        lambda a: pl.pallas_call(
            k_copy,
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(a)
    )
    t = _timeit_chained(f, x, iters=4)
    return 2 * x.size * 2 / t  # read + write


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.attention.batch import (
        BatchDecodeWithPagedKVCacheWrapper,
    )

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    on_tpu = dev.platform == "tpu"

    copy_bw = _measure_copy_roofline()

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    pages_per_req = KV_LEN // PAGE_SIZE
    total_pages = BATCH * pages_per_req + 8
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
    q0 = jnp.asarray(rng.standard_normal((BATCH, NUM_QO_HEADS, HEAD_DIM)), dtype)

    wrapper = BatchDecodeWithPagedKVCacheWrapper(
        kv_layout="HND", backend="pallas" if on_tpu else "reference"
    )
    wrapper.plan(
        indptr, indices, last, NUM_QO_HEADS, NUM_KV_HEADS, HEAD_DIM, PAGE_SIZE,
        kv_chunk_size=2048,
    )

    # chain q through the output so iterations serialize
    step = jax.jit(
        lambda q, kc, vc: q + wrapper.run(q, (kc, vc)) * jnp.bfloat16(1e-6)
    )
    t = _timeit_chained(lambda q: step(q, k_cache, v_cache), q0)

    kv_bytes = BATCH * KV_LEN * NUM_KV_HEADS * HEAD_DIM * 2 * 2  # k+v, bf16
    achieved = kv_bytes / t
    # north-star: >=85% of v5e's 819 GB/s nominal HBM roofline. The dev
    # tunnel is heavily de-rated (measured streaming copy included in the
    # unit string for context), so vs_baseline underestimates real-HW perf.
    target = 0.85 * 819e9

    print(
        json.dumps(
            {
                "metric": "paged_decode_attention_read_bw",
                "value": round(achieved / 1e9, 2),
                "unit": f"GB/s ({t*1e3:.3f} ms/step, env copy roofline "
                        f"{copy_bw/1e9:.1f} GB/s rw;"
                        f" b{BATCH} kv{KV_LEN} h{NUM_QO_HEADS}/{NUM_KV_HEADS}"
                        f" d{HEAD_DIM} p{PAGE_SIZE} bf16, {kind})",
                "vs_baseline": round(achieved / target, 4),
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
                    "metric": "paged_decode_attention_read_bw",
                    "value": 0.0,
                    "unit": f"error: {type(e).__name__}: {e}"[:400],
                    "vs_baseline": 0.0,
                }
            )
        )
        sys.exit(0)
