"""Kernel decomposition harness — the TPU answer to the reference's
in-kernel profiler (include/flashinfer/profiler.cuh:33-143).

The reference compiles kernels with -DFLASHINFER_ENABLE_PROFILER and records
(tag, %globaltimer) events per block. TPU Pallas exposes no in-kernel
clock, so timestamps are impossible; instead this harness times
INSTRUMENTED BUILDS of the same kernel with stages stripped
(FLASHINFER_TPU_KERNEL_PROBE env var read at trace time):

  full     — the production kernel
  dma      — DMA pipeline + grid walk only (no compute body)
  compute  — compute body on resident garbage (no DMA)
  grid     — grid walk only (per-grid-step overhead floor)

From these, per-step DMA time, compute time, fixed overhead, and the
DMA/compute overlap efficiency (full vs max(dma, compute)) are measured —
the same questions profiler.cuh's event stream answers, by subtraction
instead of timestamps.

Usage: python benchmarks/kernel_decomp.py [--routine decode|prefill|mla]
       [--kv-dtype ...]   (one JSON line per probe setting)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = ["full", "dma", "compute", "grid"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--routine", default="decode",
                    choices=["decode", "prefill", "mla"])
    ap.add_argument("--kv-dtype", default="model",
                    choices=["model", "fp8_e4m3", "int8"])
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--s-kv", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--tile-k", type=int, default=None)
    args = ap.parse_args()

    import flashinfer_tpu_benchmark as B

    rows = {}
    for probe in PROBES:
        os.environ["FLASHINFER_TPU_KERNEL_PROBE"] = (
            "" if probe == "full" else probe)
        ns = argparse.Namespace(
            routine={"decode": "BatchDecodeWithPagedKVCacheWrapper",
                     "prefill": "BatchPrefillWithRaggedKVCacheWrapper",
                     "mla": "mla"}[args.routine],
            kv_dtype=args.kv_dtype, weight_dtype="model",
            batch_size=args.batch_size or
            {"decode": 64, "prefill": 8, "mla": 32}[args.routine],
            s_qo=1024, s_kv=args.s_kv,
            num_qo_heads={"decode": 32, "prefill": 16, "mla": 128}[
                args.routine],
            num_kv_heads={"decode": 8, "prefill": 16, "mla": 1}[args.routine],
            head_dim=128, head_dim_vo=0,
            page_size={"decode": 32, "prefill": 16, "mla": 64}[args.routine],
            causal=args.routine == "prefill", dtype="bfloat16",
            iters=args.iters, tile_k=args.tile_k,
            kv_layout="NHD", kv_chunk_size=None,
        )
        fn = B.bench_mla if args.routine == "mla" else B.bench_attention
        r = fn(ns)
        r["probe"] = probe
        rows[probe] = r["median_time_ms"]
        print(json.dumps(r), flush=True)
    os.environ.pop("FLASHINFER_TPU_KERNEL_PROBE", None)
    if len(rows) == len(PROBES):
        full, dma, comp, grid = (rows[p] for p in PROBES)
        denom = max(max(dma, comp), 1e-9)
        print(json.dumps({
            "decomposition_ms": {
                "full": full, "dma_pipeline": dma, "compute": comp,
                "grid_overhead": grid,
                "dma_only": round(dma - grid, 4),
                "compute_only": round(comp - grid, 4),
            },
            # 1.0 => DMA and compute fully overlap (full == max of the two)
            "overlap_efficiency": round(denom / max(full, 1e-9), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
