"""AOT warmup: pre-compile the default kernel universe.

Reference parity: flashinfer/aot.py (:634 main, :396 gen_all_modules) — the
reference enumerates the JitSpec universe (backend × dtype × head_dim ×
feature flags) and compiles .so files into a wheel.  The TPU analogue is
XLA's persistent compilation cache: we enumerate the same logical universe
as (wrapper, shape-bucket) combinations, trace + compile each under
``jax.jit``, and let ``jax_compilation_cache_dir`` persist the executables.
A later ``plan()/run()`` with shapes in the same bucket hits the cache and
skips Mosaic/XLA compilation entirely — the role AOT wheels play for the
reference.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Iterable, Optional, Sequence

import numpy as np

__all__ = ["AotConfig", "default_universe", "warmup"]


@dataclasses.dataclass(frozen=True)
class AotConfig:
    """One compile target: a named (op, shape-bucket, dtype) combination."""

    name: str
    op: str  # "decode" | "prefill" | "ragged" | "sampling" | "norm_rope_act"
    batch: int = 8
    seq: int = 128
    kv_len: int = 512
    num_qo_heads: int = 8
    num_kv_heads: int = 8
    head_dim: int = 128
    page_size: int = 16
    dtype: str = "bfloat16"
    causal: bool = True


def default_universe() -> list[AotConfig]:
    """The default module universe (reference gen_all_modules, aot.py:396):
    decode/prefill × GQA grouping × head dims {64,128,256}."""
    configs = []
    for op, hd, (hq, hkv) in itertools.product(
        ("decode", "prefill", "ragged"),
        (64, 128, 256),
        ((8, 8), (8, 2)),
    ):
        configs.append(
            AotConfig(
                name=f"{op}_h{hq}x{hkv}_d{hd}",
                op=op,
                num_qo_heads=hq,
                num_kv_heads=hkv,
                head_dim=hd,
            )
        )
    configs.append(AotConfig(name="sampling", op="sampling"))
    configs.append(AotConfig(name="norm_rope_act", op="norm_rope_act"))
    return configs


def _compile_attention(cfg: AotConfig, verbose: bool) -> None:
    import jax
    import jax.numpy as jnp

    from flashinfer_tpu.ops.attention.batch import (
        BatchDecodeWithPagedKVCacheWrapper,
        BatchPrefillWithPagedKVCacheWrapper,
        BatchPrefillWithRaggedKVCacheWrapper,
    )

    dtype = jnp.dtype(cfg.dtype)
    b, d, ps = cfg.batch, cfg.head_dim, cfg.page_size
    if cfg.op == "ragged":
        w = BatchPrefillWithRaggedKVCacheWrapper(backend="pallas")
        qo_indptr = np.arange(b + 1) * cfg.seq
        kv_indptr = np.arange(b + 1) * cfg.kv_len
        w.plan(qo_indptr, kv_indptr, cfg.num_qo_heads, cfg.num_kv_heads, d,
               causal=cfg.causal)
        q = jnp.zeros((b * cfg.seq, cfg.num_qo_heads, d), dtype)
        k = jnp.zeros((b * cfg.kv_len, cfg.num_kv_heads, d), dtype)
        fn = jax.jit(lambda q, k, v: w.run(q, (k, v)))
        fn.lower(q, k, k).compile()
        return
    pages = -(-cfg.kv_len // ps)
    indptr = np.arange(b + 1) * pages
    indices = np.arange(b * pages, dtype=np.int32)
    last = np.full(b, ((cfg.kv_len - 1) % ps) + 1, np.int32)
    kc = jnp.zeros((b * pages + 1, cfg.num_kv_heads, ps, d), dtype)
    if cfg.op == "decode":
        w = BatchDecodeWithPagedKVCacheWrapper(backend="pallas")
        w.plan(indptr, indices, last, cfg.num_qo_heads, cfg.num_kv_heads, d, ps)
        q = jnp.zeros((b, cfg.num_qo_heads, d), dtype)
    else:
        w = BatchPrefillWithPagedKVCacheWrapper(backend="pallas")
        qo_indptr = np.arange(b + 1) * cfg.seq
        w.plan(qo_indptr, indptr, indices, last, cfg.num_qo_heads,
               cfg.num_kv_heads, d, ps, causal=cfg.causal)
        q = jnp.zeros((b * cfg.seq, cfg.num_qo_heads, d), dtype)
    fn = jax.jit(lambda q, kc, vc: w.run(q, (kc, vc)))
    fn.lower(q, kc, kc).compile()


def _compile_misc(cfg: AotConfig, verbose: bool) -> None:
    import jax
    import jax.numpy as jnp

    import flashinfer_tpu as fi

    if cfg.op == "sampling":
        probs = jnp.zeros((cfg.batch, 1024), jnp.float32)
        key = jax.random.key(0)
        for fn in (
            lambda p, k: fi.top_p_sampling_from_probs(p, k, 0.9),
            lambda p, k: fi.top_k_sampling_from_probs(p, k, 40),
            lambda p, k: fi.min_p_sampling_from_probs(p, k, 0.05),
            lambda p, k: fi.sampling_from_probs(p, k),
        ):
            jax.jit(fn).lower(probs, key).compile()
    else:
        x = jnp.zeros((cfg.batch * cfg.seq, 4 * cfg.head_dim), jnp.bfloat16)
        wgt = jnp.ones((4 * cfg.head_dim,), jnp.bfloat16)
        jax.jit(fi.rmsnorm).lower(x, wgt).compile()
        jax.jit(fi.silu_and_mul).lower(
            jnp.zeros((cfg.batch * cfg.seq, 8 * cfg.head_dim), jnp.bfloat16)
        ).compile()


def warmup(
    configs: Optional[Iterable[str]] = None,
    universe: Optional[Sequence[AotConfig]] = None,
    verbose: bool = False,
) -> int:
    """Compile each config; returns the number compiled. ``configs`` filters
    by name substring."""
    universe = list(universe or default_universe())
    if configs:
        pats = list(configs)
        universe = [c for c in universe if any(p in c.name for p in pats)]
    n = 0
    for cfg in universe:
        if verbose:
            print(f"[aot] compiling {cfg.name}", flush=True)
        if cfg.op in ("decode", "prefill", "ragged"):
            _compile_attention(cfg, verbose)
        else:
            _compile_misc(cfg, verbose)
        n += 1
    return n
