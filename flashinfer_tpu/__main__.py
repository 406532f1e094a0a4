"""``python -m flashinfer_tpu`` — framework CLI.

Reference parity: flashinfer/__main__.py:59 (click CLI with ``show-config``,
JIT cache status/clear, module registry listing).  argparse instead of click
(no extra deps); the artifact/cubin subcommands have no TPU counterpart —
XLA's persistent compilation cache plays that role and is reported by
``show-config`` / warmed by ``aot``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cmd_show_config(_args) -> int:
    import jax

    import flashinfer_tpu
    from flashinfer_tpu.jit import CACHE_DIR, jit_registry
    from flashinfer_tpu.jit.env import planner_backend
    from flashinfer_tpu.scheduler.native import native_plan_available

    info = {
        "flashinfer_tpu_version": flashinfer_tpu.__version__,
        "jax_version": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "default_backend": jax.default_backend(),
        "native_cache_dir": str(CACHE_DIR),
        "planner_backend": planner_backend(),
        "native_runtime_available": native_plan_available(),
        "native_modules": jit_registry.get_stats(),
        "env": {
            k: v
            for k, v in os.environ.items()
            if k.startswith(("FLASHINFER_TPU_", "JAX_", "XLA_"))
        },
    }
    print(json.dumps(info, indent=2))
    return 0


def _cmd_cache_status(_args) -> int:
    from flashinfer_tpu.jit.env import NATIVE_BUILD_DIR

    entries = []
    if NATIVE_BUILD_DIR.exists():
        for p in sorted(NATIVE_BUILD_DIR.glob("*.so")):
            entries.append({"file": p.name, "bytes": p.stat().st_size})
    print(json.dumps({"dir": str(NATIVE_BUILD_DIR), "entries": entries}, indent=2))
    return 0


def _cmd_cache_clear(_args) -> int:
    from flashinfer_tpu.jit import clear_cache

    print(f"removed {clear_cache()} cached native build files")
    return 0


def _cmd_list_ops(_args) -> int:
    import flashinfer_tpu

    for name in sorted(flashinfer_tpu.__all__):
        print(name)
    return 0


def _cmd_aot(args) -> int:
    from flashinfer_tpu.aot import warmup

    n = warmup(configs=args.config or None, verbose=True)
    print(f"warmed {n} compilation-cache entries")
    return 0


def _cmd_tune(args) -> int:
    """Offline tactic tuning over a standard serving-shape grid (the role
    of the reference's shipped tuning_configs/, autotuner.py:26): profiles
    VMEM-legal attention tiles on the attached device and persists the
    winners for every future run to consult."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import flashinfer_tpu as fi
    from flashinfer_tpu.autotuner import AutoTuner, autotune, get_config_path

    rng = np.random.default_rng(0)
    only = getattr(args, "only", None)

    def want(section):
        return only is None or only == section

    shapes = []
    for b, kv in ((16, 1024), (64, 2048)):
        for hq, hkv in ((32, 8), (16, 4)):
            shapes.append((b, kv, hq, hkv))
    if args.quick:
        shapes = shapes[:1]
    if not want("decode"):
        shapes = []
    with autotune():
        for b, kv, hq, hkv in shapes:
            for kv_dtype in ("bf16", "fp8"):
                ps, d = 32, 128
                pages = kv // ps
                indptr = np.arange(b + 1) * pages
                indices = rng.permutation(b * pages)[: b * pages].astype(
                    np.int32)
                last = np.full(b, ps, np.int32)
                dt = jnp.bfloat16 if kv_dtype == "bf16" else jnp.float8_e4m3fn
                kc = jnp.asarray(
                    rng.standard_normal((b * pages + 8, hkv, ps, d)), dt)
                vc = jnp.asarray(
                    rng.standard_normal((b * pages + 8, hkv, ps, d)), dt)
                q = jnp.asarray(
                    rng.standard_normal((b, hq, d)), jnp.bfloat16)
                w = fi.BatchDecodeWithPagedKVCacheWrapper(backend="pallas")
                w.plan(indptr, indices, last, hq, hkv, d, ps,
                       kv_len_arr=np.full(b, kv))
                out = w.run(q, (kc, vc))
                jax.block_until_ready(out)
                print(f"tuned decode b{b} kv{kv} h{hq}/{hkv} {kv_dtype}",
                      flush=True)
        # prefill: profiles the fori_loop-over-heads tactics against the
        # unrolled head-group tiles (h_blk, tile_k, head_loop)
        prefill_shapes = [(8, 1024, 16, 16), (8, 1024, 32, 8)]
        if args.quick:
            prefill_shapes = prefill_shapes[:1]
        if not want("prefill"):
            prefill_shapes = []
        for b, sq, hq, hkv in prefill_shapes:
            d = 128
            qo_indptr = np.arange(b + 1) * sq
            kv_indptr = np.arange(b + 1) * sq
            q = jnp.asarray(
                rng.standard_normal((b * sq, hq, d)), jnp.bfloat16)
            k = jnp.asarray(
                rng.standard_normal((b * sq, hkv, d)), jnp.bfloat16)
            v = jnp.asarray(
                rng.standard_normal((b * sq, hkv, d)), jnp.bfloat16)
            w = fi.BatchPrefillWithRaggedKVCacheWrapper(backend="pallas")
            w.plan(qo_indptr, kv_indptr, hq, hkv, d, causal=True)
            jax.block_until_ready(w.run(q, (k, v)))
            print(f"tuned prefill b{b} s{sq} h{hq}/{hkv}", flush=True)
        # an explicit --only mla overrides --quick (otherwise the
        # combination would silently tune nothing)
        if want("mla") and (not args.quick or args.only == "mla"):
            # MLA decode (DeepSeek dckv 512 + dkpe 64): tile_k tactics
            from flashinfer_tpu.ops.attention.mla import (
                BatchMLAPagedAttentionWrapper,
            )
            b, kv, h, ps = 32, 2048, 128, 64
            pages = kv // ps
            indptr = np.arange(b + 1) * pages
            indices = np.arange(b * pages, dtype=np.int32)
            qn = jnp.asarray(rng.standard_normal((b, h, 512)), jnp.bfloat16)
            qp = jnp.asarray(rng.standard_normal((b, h, 64)), jnp.bfloat16)
            for kv_dtype in ("bf16", "fp8"):
                if kv_dtype == "bf16":
                    ckv = jnp.asarray(
                        rng.standard_normal((b * pages + 4, ps, 512)),
                        jnp.bfloat16)
                    kpe = jnp.asarray(
                        rng.standard_normal((b * pages + 4, ps, 128)),
                        jnp.bfloat16)
                else:  # int8 e4m3 bit containers (the engine's cache form)
                    ckv = jnp.asarray(rng.integers(
                        0, 127, (b * pages + 4, ps, 512)), jnp.int8)
                    kpe = jnp.asarray(rng.integers(
                        0, 127, (b * pages + 4, ps, 128)), jnp.int8)
                wm = BatchMLAPagedAttentionWrapper(backend="pallas")
                wm.plan(np.arange(b + 1), indptr, indices, np.full(b, kv),
                        h, 512, 64, ps)
                jax.block_until_ready(wm.run(qn, qp, ckv, kpe))
                print(f"tuned mla b{b} kv{kv} h{h} {kv_dtype}", flush=True)
    t = AutoTuner.get()
    print(f"profiled {t.stats.profiled_tactics} tactics across "
          f"{t.stats.tuned_ops} ops -> {get_config_path()}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="flashinfer_tpu", description=__doc__.splitlines()[0]
    )
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("show-config", help="dump version/device/env/cache info")
    sub.add_parser("cache-status", help="list cached native builds")
    sub.add_parser("cache-clear", help="delete cached native builds")
    sub.add_parser("list-ops", help="list public API symbols")
    p_aot = sub.add_parser(
        "aot", help="pre-compile the default kernel universe into the "
        "persistent compilation cache"
    )
    p_aot.add_argument("--config", action="append", help="config name(s)")
    p_tune = sub.add_parser(
        "tune", help="profile attention tile tactics on the attached "
        "device and persist winners (reference tuning_configs/ role)"
    )
    p_tune.add_argument("--quick", action="store_true",
                        help="one shape only (smoke)")
    p_tune.add_argument("--only", choices=("decode", "prefill", "mla"),
                        help="tune a single section (resumable campaigns)")

    args = parser.parse_args(argv)
    return {
        "show-config": _cmd_show_config,
        "cache-status": _cmd_cache_status,
        "cache-clear": _cmd_cache_clear,
        "list-ops": _cmd_list_ops,
        "aot": _cmd_aot,
        "tune": _cmd_tune,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
