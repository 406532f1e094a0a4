"""Headline benchmark: FP8 paged decode attention vs HBM roofline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North-star (BASELINE.md): FP8 paged decode. value = EFFECTIVE KV bandwidth
(bf16-equivalent logical bytes / time — fp8 halves the physical bytes, so
effective rate above the bf16 roofline is the point of the format);
vs_baseline = effective_bw / (0.85 * nominal_hbm_bw). The unit string
carries the physical fp8 byte rate and the bf16 kernel's rate from the
same session for context.

Methodology (reference analogue: CUDA-event timing + CUDA-graph replay,
flashinfer/testing/utils.py:538,855):
  * The dev environment tunnels to the TPU with ~2-4 ms dispatch latency
    per executable launch, so per-call wall timing is meaningless. We time
    a lax.scan of N kernel iterations inside ONE compiled program and take
    the difference between a long and a short scan:
        per_iter = (T(n_long) - T(n_short)) / (n_long - n_short)
    which cancels dispatch latency, H2D/D2H, and scan overhead — the same
    role CUDA-graph replay timing plays for the reference.
  * Caches are passed as jit arguments (closure capture would embed 0.5 GB
    as HLO constants and overflow the remote-compile transport).
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
N_SHORT = 4
N_LONG = 36

# Nominal HBM bandwidth by device kind (GB/s). The measured streaming
# ceiling on the tunneled dev chip is ~650 GB/s for v5e (fits 819 nominal
# at typical ~80% efficiency), so the roofline fraction is comparable to
# real-HW numbers.
_NOMINAL_HBM = {
    "v5 lite": 819e9,
    "v5litepod": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6 lite": 1640e9,
    "v6e": 1640e9,
}


def _nominal_bw(kind: str) -> float:
    kind = kind.lower()
    for key, bw in _NOMINAL_HBM.items():
        if key in kind:
            return bw
    return 819e9


def main(gate_note: str = "") -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.attention.batch import (
        BatchDecodeWithPagedKVCacheWrapper,
    )

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    on_tpu = dev.platform == "tpu"

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

    def time_mode(kc, vc):
        wrapper = BatchDecodeWithPagedKVCacheWrapper(
            kv_layout="HND", backend="pallas" if on_tpu else "reference"
        )
        wrapper.plan(
            indptr, indices, last, NUM_QO_HEADS, NUM_KV_HEADS, HEAD_DIM,
            PAGE_SIZE, kv_chunk_size=2048,
        )

        def step(q, _, kc, vc):
            o = wrapper.run(q, (kc, vc))
            # chain q through the output so scan iterations serialize
            return q + o.astype(q.dtype) * jnp.bfloat16(0.001), ()

        def make(n):
            return jax.jit(
                lambda q, kc, vc: jax.lax.scan(
                    functools.partial(step, kc=kc, vc=vc), q, None, length=n
                )[0]
            )

        def timed(f, repeats=7):
            y = f(q0, kc, vc)
            np.asarray(y.ravel()[0])  # warm: compile + run
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                y = f(q0, kc, vc)
                np.asarray(y.ravel()[0])
                times.append(time.perf_counter() - t0)
            return float(np.min(times))

        t_short = timed(make(N_SHORT))
        t_long = timed(make(N_LONG))
        return (t_long - t_short) / (N_LONG - N_SHORT)

    # interleave the two modes (tunnel timing drifts between runs)
    t_bf16, t_fp8 = [], []
    kc8 = jax.lax.bitcast_convert_type(
        k_cache.astype(jnp.float8_e4m3fn), jnp.int8)
    vc8 = jax.lax.bitcast_convert_type(
        v_cache.astype(jnp.float8_e4m3fn), jnp.int8)
    kc8 = jax.lax.bitcast_convert_type(kc8, jnp.float8_e4m3fn)
    vc8 = jax.lax.bitcast_convert_type(vc8, jnp.float8_e4m3fn)
    for _ in range(2):
        t_bf16.append(time_mode(k_cache, v_cache))
        t_fp8.append(time_mode(kc8, vc8))
    per_iter_bf16 = min(t_bf16)
    per_iter = min(t_fp8)

    kv_logical = BATCH * KV_LEN * NUM_KV_HEADS * HEAD_DIM * 2 * 2  # bf16-equiv
    effective = kv_logical / per_iter
    physical = (kv_logical // 2) / per_iter
    bf16_bw = kv_logical / per_iter_bf16
    target = 0.85 * _nominal_bw(kind)

    print(
        json.dumps(
            {
                "metric": "fp8_paged_decode_effective_kv_bw",
                "value": round(effective / 1e9, 2),
                "unit": f"GB/s bf16-equivalent ({per_iter*1e3:.3f} ms/iter"
                        f" differential-scan; physical fp8 read"
                        f" {physical/1e9:.0f} GB/s; bf16 kernel same-session"
                        f" {bf16_bw/1e9:.0f} GB/s @ {per_iter_bf16*1e3:.3f}"
                        f" ms/iter; b{BATCH} kv{KV_LEN}"
                        f" h{NUM_QO_HEADS}/{NUM_KV_HEADS} d{HEAD_DIM}"
                        f" p{PAGE_SIZE}, {kind}){gate_note}",
                "vs_baseline": round(effective / target, 4),
            }
        )
    )


def _backend_up() -> bool:
    """Probe backend init in a SUBPROCESS (a failed in-process init poisons
    jax's backend cache for the whole run)."""
    import subprocess

    r = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        capture_output=True, timeout=240,
    )
    return r.returncode == 0


if __name__ == "__main__":
    # The axon TPU tunnel has transient outages (observed 2026-08-17:
    # backend init UNAVAILABLE for ~1h). Retry init for up to ~20 min
    # before giving up so a blip doesn't zero the round's headline.
    last_err = "backend probe failed"
    for attempt in range(5):
        try:
            up = _backend_up()
        except Exception as e:  # noqa: BLE001
            up, last_err = False, f"{type(e).__name__}: {e}"
        if up:
            break
        time.sleep(240 if attempt < 4 else 0)
    # Mosaic legality gate (round-2 review item): compile+run every feature
    # combination on the hardware BEFORE the headline timing, fail loudly.
    # A gate TIMEOUT (tunnel congestion) is reported but does not zero the
    # headline; a legality FAILURE does.
    gate_note = ""
    if up:
        import os
        import subprocess

        gate = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "tpu_compile_check.py")
        try:
            r = subprocess.run(
                [sys.executable, gate], capture_output=True, text=True,
                timeout=1500,
            )
            sys.stderr.write(r.stdout[-4000:] + r.stderr[-2000:])
            if r.returncode != 0:
                fails = [ln for ln in r.stdout.splitlines()
                         if ln.startswith("FAIL")]
                print(json.dumps({
                    "metric": "fp8_paged_decode_effective_kv_bw",
                    "value": 0.0,
                    "unit": ("mosaic gate FAILED: "
                             + "; ".join(fails)[:350]),
                    "vs_baseline": 0.0,
                }))
                sys.exit(0)
            gate_note = " [mosaic-gate ok]"
        except subprocess.TimeoutExpired:
            gate_note = " [mosaic-gate timeout]"
    try:
        main(gate_note)
    except Exception as e:  # keep the contract: one JSON line, always
        print(
            json.dumps(
                {
                    "metric": "fp8_paged_decode_effective_kv_bw",
                    "value": 0.0,
                    "unit": f"error: {type(e).__name__}: {e}"[:400],
                    "vs_baseline": 0.0,
                }
            )
        )
        sys.exit(0)
