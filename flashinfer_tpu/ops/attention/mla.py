"""DeepSeek MLA (matrix-absorbed multi-head latent attention), paged.

Reference parity: flashinfer/mla.py:85 ``BatchMLAPagedAttentionWrapper``
(plan :221, run :324); kernels include/flashinfer/attention/mla.cuh:777
(BatchMLAPagedAttentionKernel) and its dedicated load-balancing MLAPlan
(scheduler.cuh:1438).

Matrix-absorbed MLA is MQA with a 512-dim compressed KV (ckv, doubles as V)
plus a 64-dim rope part (kpe): score = q_nope·ckv + q_pe·kpe, out = P·ckv.

TPU-first design: this is a *perfect* fit for the GQA-packed paged kernel
shape — one shared KV stream, all num_heads query heads packed into tile
rows. The kernel streams each page ONCE into separate ckv/kpe VMEM buffers
(Mosaic only DMAs full 128-lane tiles, so the 64-lane kpe cannot ride a
lane-slice of a combined buffer; kpe is 128-lane padded), computes
score = q_ckv·ckv + q_pe·kpe as two MXU dots, and reuses the ckv buffer as
V — per-token HBM traffic is ckv+kpe only, no separate V read. Split-KV
partials merge through the shared gather-merge path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashinfer_tpu.ops.attention.batch import (
    DevicePlan,
    PlanMeta,
    PlanState,
    _bucket,
    round_up_np,
)
from flashinfer_tpu.ops.attention.kernels.paged import (
    _E4M3_EXP_SHIFT,
    _E4M3_SHIFT_SCALE,
    _VMEM_BUDGET,
    _e4m3_decode_rows,
    _permute_kv_offsets,
)
from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.attention.state import gather_merge_states
from flashinfer_tpu.scheduler.plan import (
    AttentionPlan,
    build_merge_src,
    plan_attention,
)
from flashinfer_tpu.utils import default_interpret, next_power_of_2, on_tpu

__all__ = ["BatchMLAPagedAttentionWrapper"]

_NEG_INF = float("-inf")
_LANES = 128

_NUM_PLAN = 12
(_REQ, _QO_TILE, _KV_TILE, _QO_START, _QO_LEN, _KV_START, _KV_END,
 _KV_PAGE_START, _NUM_SPLITS, _Q_POS_BASE, _DMA_NEW, _DMA_SLOT
 ) = range(_NUM_PLAN)


def _mla_kernel(
    *refs,
    sm_scale: float,
    v_scale: float,
    kv_dequant: Optional[str],
    causal: bool,
    group: int,
    tile_q: int,
    tile_k: int,
    page_size: int,
    nsub: int,
    num_items: int,
    d_ckv: int,
    d_kpe: int,
    probe: Optional[str] = None,
):
    idx = 0
    # ONE flat [12*T] plan operand (see kernels/paged.py: per-operand
    # scalar-prefetch prologue cost; Mosaic takes 1-D scalar prefetch only)
    plan_flat = refs[idx]; idx += 1

    class _PlanRow:
        __slots__ = ("base",)

        def __init__(self, i):
            self.base = i * num_items

        def __getitem__(self, w):
            return plan_flat[self.base + w]

    plan_refs = [_PlanRow(i) for i in range(_NUM_PLAN)]
    kv_indices_ref = refs[idx]; idx += 1
    q_ckv_ref = refs[idx]; idx += 1
    q_pe_ref = refs[idx]; idx += 1
    ckv_hbm = refs[idx]; idx += 1
    kpe_hbm = refs[idx]; idx += 1
    out_ref, lse_ref = refs[idx : idx + 2]; idx += 2
    (ckv_buf, kpe_buf, sem_ckv, sem_kpe, acc_ref, m_ref,
     l_ref) = refs[idx : idx + 7]

    w = pl.program_id(0)
    j = pl.program_id(1)
    ppst = tile_k // page_size
    flat = w * nsub + j
    total_steps = num_items * nsub

    def descriptors(wi, ji):
        kv_s = plan_refs[_KV_START][wi]
        kv_e = plan_refs[_KV_END][wi]
        page0 = plan_refs[_KV_PAGE_START][wi]
        return page0, ji * tile_k, kv_e - kv_s - ji * tile_k

    # ckv and kpe keep separate VMEM buffers: a 64-lane kpe DMA into a lane
    # slice of a combined buffer violates Mosaic's 128-lane slice tiling.
    def start_dmas(wi, ji, slot):
        page0, sub_start, remaining = descriptors(wi, ji)
        for p in range(ppst):
            @pl.when(p * page_size < remaining)
            def _():
                page_id = kv_indices_ref[page0 + sub_start // page_size + p]
                psl = pl.ds(p * page_size, page_size)
                pltpu.make_async_copy(
                    ckv_hbm.at[page_id], ckv_buf.at[slot, psl, :],
                    sem_ckv.at[slot, p],
                ).start()
                pltpu.make_async_copy(
                    kpe_hbm.at[page_id], kpe_buf.at[slot, psl, :],
                    sem_kpe.at[slot, p],
                ).start()

    def wait_dmas(wi, ji, slot):
        page0, sub_start, remaining = descriptors(wi, ji)
        for p in range(ppst):
            @pl.when(p * page_size < remaining)
            def _():
                psl = pl.ds(p * page_size, page_size)
                d1 = ckv_buf.at[slot, psl, :]
                pltpu.make_async_copy(d1, d1, sem_ckv.at[slot, p]).wait()
                d2 = kpe_buf.at[slot, psl, :]
                pltpu.make_async_copy(d2, d2, sem_kpe.at[slot, p]).wait()

    # probe: instrumented-build decomposition (reference profiler.cuh role;
    # TPU Pallas exposes no in-kernel clock, so instead of timestamped
    # events the harness times stripped variants — see
    # benchmarks/kernel_decomp.py): "grid" = grid walk only, "dma" = DMA
    # pipeline only, "compute" = body on resident garbage (no DMA).
    do_dma = probe not in ("grid", "compute")
    do_compute = probe not in ("grid", "dma")

    if do_dma:
        @pl.when(flat == 0)
        def _warmup():
            start_dmas(w, j, 0)

        @pl.when(flat + 1 < total_steps)
        def _prefetch():
            nf = flat + 1
            start_dmas(nf // nsub, nf % nsub, nf % 2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    slot = flat % 2
    if do_dma:
        wait_dmas(w, j, slot)

    page0, sub_start, remaining = descriptors(w, j)
    valid_item = plan_refs[_REQ][w] >= 0
    fp8 = kv_dequant == "e4m3"
    half = tile_k // 2

    def _body(masked: bool):
        # zero V rows beyond the valid kv range: they hold whatever the DMA
        # left behind (NaN in interpret mode) and 0*NaN would poison the PV
        # dot. Only the V use needs it — the QK side is masked through s
        # (where(mask, ...) below), so garbage K rows never survive; this
        # saves full [tile_k, d] cleanup passes over ckv and kpe.
        q_ckv = q_ckv_ref[0]
        q_pe = q_pe_ref[0]
        dn = (((1,), (1,)), ((), ()))
        if kv_dequant == "int8":
            # LINEAR int8 cache (TPU-native 8-bit container): ONE hardware
            # convert per operand — vs the e4m3 bit decode's 9 int32 ops
            # per 4 elements. The per-tensor scale is folded into
            # sm_scale/v_scale by the wrapper; rows are NOT permuted.
            ck_t = ckv_buf[slot].astype(jnp.bfloat16)
            kp_t = kpe_buf[slot].astype(jnp.bfloat16)
        else:
            ck_t = ckv_buf[slot]
            kp_t = kpe_buf[slot]
        if fp8:
            # fp8 caches ship as int8 bits (pre-v6 TPUs have no hw fp8);
            # packed bit decode yields even/odd row halves at 2^-120 scale.
            # 2^60 on the tiny q tiles keeps QK products in f32 normal
            # range; sm_scale (folded by the run wrapper) carries the other
            # 2^60, and v_scale carries 2^60 for the PV side.
            ce, co = _e4m3_decode_rows(ckv_buf[slot])
            pe_e, pe_o = _e4m3_decode_rows(kpe_buf[slot])
            qc = (q_ckv * q_ckv.dtype.type(_E4M3_SHIFT_SCALE)).astype(ce.dtype)
            qp = (q_pe * q_pe.dtype.type(_E4M3_SHIFT_SCALE)).astype(ce.dtype)
            s = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        qc, ce, dn, preferred_element_type=jnp.float32
                    ) + jax.lax.dot_general(
                        qp, pe_e, dn, preferred_element_type=jnp.float32
                    ),
                    jax.lax.dot_general(
                        qc, co, dn, preferred_element_type=jnp.float32
                    ) + jax.lax.dot_general(
                        qp, pe_o, dn, preferred_element_type=jnp.float32
                    ),
                ],
                axis=1,
            )
        else:
            s = jax.lax.dot_general(
                q_ckv, ck_t, dn,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q_pe, kp_t, dn,
                preferred_element_type=jnp.float32,
            )
        # exp2 is the hardware transcendental: fold log2(e) into the scale
        s = s * (sm_scale * 1.4426950408889634)

        if masked:
            qo_local0 = plan_refs[_QO_TILE][w] * tile_q
            row = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 1)
            vrow = jax.lax.broadcasted_iota(jnp.int32, (tile_k, 1), 0)
            if fp8:
                # packed decode permutes KV rows; positions/masks must use
                # permuted coordinates
                col = _permute_kv_offsets(col, tile_k)
                vrow = _permute_kv_offsets(vrow, tile_k)
            q_tok = plan_refs[_Q_POS_BASE][w] + (qo_local0 + row) // group
            kv_pos = plan_refs[_KV_START][w] + sub_start + col
            mask = col < remaining
            if causal:
                mask = jnp.logical_and(mask, kv_pos <= q_tok)
            s = jnp.where(mask, s, _NEG_INF)
            col_valid = vrow < remaining

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        if fp8:
            # +60 on the exp2 argument makes P 2^60-scaled for free, so
            # P @ V(2^-120) accumulates at 2^-60 — safely in f32 normal
            # range; finalize rescales l by 2^-60 and v_scale carries the
            # last 2^60
            p = jnp.exp2(s - (m_safe[:, :1] - _E4M3_EXP_SHIFT))
        else:
            p = jnp.exp2(s - m_safe[:, :1])
        if masked:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.where(jnp.isneginf(m_prev), 0.0, jnp.exp2(m_prev - m_safe))
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        # V IS the compressed KV — zero extra HBM traffic
        dn0 = (((1,), (0,)), ((), ()))
        if fp8:
            pb = p.astype(ce.dtype)
            ve = jnp.where(col_valid[:half], ce, 0) if masked else ce
            vo = jnp.where(col_valid[half:], co, 0) if masked else co
            pv = jax.lax.dot_general(
                pb[:, :half], ve, dn0, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                pb[:, half:], vo, dn0, preferred_element_type=jnp.float32
            )
        else:
            v = jnp.where(col_valid, ck_t, 0) if masked else ck_t
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, dn0, preferred_element_type=jnp.float32
            )
        acc_ref[:] = acc_ref[:] * alpha[:, :1] + pv

    # interior tiles (fully valid, causality can't bite — scalar-decided per
    # grid step) skip mask construction and both where-passes, same
    # specialization as the paged kernel's decode path
    active = jnp.logical_and(valid_item, remaining > 0)
    interior = remaining >= tile_k
    if causal:
        min_q_tok = plan_refs[_Q_POS_BASE][w] + (
            plan_refs[_QO_TILE][w] * tile_q
        ) // group
        max_kv_pos = plan_refs[_KV_START][w] + sub_start + tile_k - 1
        interior = jnp.logical_and(interior, min_q_tok >= max_kv_pos)

    if do_compute:
        @pl.when(jnp.logical_and(active, interior))
        def _compute_interior():
            _body(masked=False)

        @pl.when(jnp.logical_and(active, jnp.logical_not(interior)))
        def _compute_masked():
            _body(masked=True)

    @pl.when(j == nsub - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        if fp8:
            # P ran 2^60-scaled (exp2 offset); bring l back to true scale so
            # acc/l lands at 2^-60 (normal f32) and v_scale (x2^60) finishes
            l = l * (2.0 ** -_E4M3_EXP_SHIFT)
        safe_l = jnp.where(l > 0, l, 1.0)
        out = acc_ref[:] / safe_l
        if v_scale != 1.0:
            out = out * v_scale
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        # m is base-2 (log2e folded into the scale); lse stays natural-log
        lse = jnp.where(
            l > 0, m_safe * 0.6931471805599453 + jnp.log(safe_l), _NEG_INF)
        out_ref[0] = out.astype(out_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _mla_tile_candidates(
    *,
    tile_q: int,
    d_ckv: int,
    d_kpe: int,
    kv_itemsize: int,
    page_size: int,
    kv_chunk_size: int,
) -> list:
    """VMEM-legal tile_k candidates for the MLA kernel (the tile_candidates
    analogue for a single 512+128-lane KV stream). Model: double-buffered
    ckv+kpe tiles, fp8 decode temporaries (decoded bf16 halves + int32
    intermediates, ~5 bytes/elem, int8 caches only), and ~3 [tile_q, tile_k]
    f32 softmax temps per body x 2 specialized bodies (Mosaic stacks both
    branches' temps — see the mosaic-tiling notes in kernels/paged.py)."""
    dsum = d_ckv + d_kpe
    fixed = (
        tile_q * (2 * d_ckv + d_kpe) * 2  # q tiles (x2 dbuf) + out
        + 3 * tile_q * max(d_ckv, _LANES) * 4  # acc/m/l f32
    )
    # 8-bit caches get a WIDE budget (the pallas_call raises
    # vmem_limit_bytes): measured on v5e, int8 at the full-chunk tile
    # (tk=2048, nsub=1, ~16.5 MB modeled) runs 0.071 ms vs 0.228 at the
    # 10 MB-legal tk=1024 — the fewer, larger steps amortize both the
    # per-step overhead and the dequant. bf16 keeps the tight budget
    # (measured: bf16 tk=2048 is 1.55x SLOWER than tk=1024).
    budget = _VMEM_BUDGET if kv_itemsize > 1 else 30 * 1024 * 1024
    cands = []
    tk = page_size
    while tk <= min(4096, kv_chunk_size):
        ok = kv_chunk_size % tk == 0
        ok = ok and tk // page_size <= 64  # DMA semaphore budget (sflags)
        # fp8 packed decode needs 4-byte-aligned row groups
        ok = ok and not (kv_itemsize == 1 and tk % 4)
        buf = 2 * tk * dsum * kv_itemsize
        dec = 5 * tk * dsum if kv_itemsize == 1 else 0
        temps = 6 * tile_q * tk * 4
        if ok and buf + dec + temps + fixed <= budget:
            cands.append(tk)
        tk *= 2
    return cands or [page_size]


def _mla_paged_run(
    q_ckv_packed: jax.Array,  # [1, padded_rows, d_ckv]
    q_pe_packed: jax.Array,  # [1, padded_rows, d_kpe]
    ckv_cache: jax.Array,  # [pages, page_size, d_ckv]
    kpe_cache: jax.Array,  # [pages, page_size, d_kpe]
    kv_indices: jax.Array,
    plan_arrays: jax.Array,  # [12, T] int32 (ONE scalar-prefetch operand)
    *,
    plan_meta: AttentionPlan,
    causal: bool,
    sm_scale: float,
    tile_k: int,
    interpret: Optional[bool],
    v_scale: float = 1.0,
    kv_dequant: Optional[str] = None,
    _tuned: bool = False,  # True inside a tuning probe (skip re-selection)
) -> Tuple[jax.Array, jax.Array]:
    """sm_scale/v_scale arrive PRE-FOLDED (k_scale and the fp8 2^60 shifts
    are folded by the wrapper — see BatchMLAPagedAttentionWrapper.run)."""
    if interpret is None:
        interpret = default_interpret()
    _, padded_rows, d_ckv_q = q_ckv_packed.shape
    page_size = ckv_cache.shape[1]
    d_ckv = ckv_cache.shape[2]
    d_kpe = kpe_cache.shape[2]
    tile_q = plan_meta.tile_q
    T = plan_meta.num_work_items

    # autotuner: persisted winner overrides the default tile_k (reference
    # autotuner.py:349; tactics = VMEM-legal page-aligned chunk divisors)
    from flashinfer_tpu.autotuner import AutoTuner

    cand_tks = _mla_tile_candidates(
        tile_q=tile_q, d_ckv=d_ckv, d_kpe=d_kpe,
        kv_itemsize=ckv_cache.dtype.itemsize, page_size=page_size,
        kv_chunk_size=plan_meta.kv_chunk_size,
    )
    # default: the largest VMEM-legal tile (fewest grid steps). An
    # explicitly pinned tile_k that divides the chunk is honored even
    # beyond the standard budget (the A/B harness explores there; the
    # pallas_call raises vmem_limit_bytes for it below).
    pinned_wide = (
        tile_k is not None
        and tile_k not in cand_tks
        and plan_meta.kv_chunk_size % tile_k == 0
        and tile_k % page_size == 0
        and not (ckv_cache.dtype.itemsize == 1 and tile_k % 4)
        and tile_k // page_size <= 64
    )
    pinned = tile_k is not None and (tile_k in cand_tks or pinned_wide)
    if not pinned:
        tile_k = cand_tks[-1]
    tactics = [{"tile_k": tk} for tk in sorted(cand_tks)]
    op_key = (
        f"mla_paged::ckv{d_ckv}xkpe{d_kpe}::tq{tile_q}"
        f"::chunk{plan_meta.kv_chunk_size}::T{T}::{ckv_cache.dtype.name}"
    )
    tuner = AutoTuner.get()
    # an explicit wrapper pin wins over the persisted autotuner winner
    # (the A/B harness must be able to force any tactic)
    sel = None if (_tuned or pinned) else tuner.cached(op_key, tactics)
    if sel is None and not (_tuned or pinned) and tuner.enabled \
            and len(tactics) > 1 \
            and not isinstance(q_ckv_packed, jax.core.Tracer):
        from flashinfer_tpu.autotuner import TunableRunner
        from flashinfer_tpu.testing.utils import bench_tpu_time_differential

        class _Runner(TunableRunner):
            def get_valid_tactics(self):
                return tactics

            def run(self, tactic, *args):
                raise NotImplementedError  # timed via time_tactic

        def time_tactic(tactic):
            def step(carry, qpe, ckv, kpe, ki, pa):
                o, _ = _mla_paged_run(
                    carry, qpe, ckv, kpe, ki, pa,
                    plan_meta=plan_meta, causal=causal, sm_scale=sm_scale,
                    tile_k=tactic["tile_k"], interpret=interpret,
                    v_scale=v_scale, kv_dequant=kv_dequant,
                    _tuned=True,
                )
                dep = jnp.sum(o.astype(jnp.float32)) * 1e-30
                return carry + dep.astype(carry.dtype)

            return bench_tpu_time_differential(
                step, q_ckv_packed, q_pe_packed, ckv_cache, kpe_cache,
                kv_indices, plan_arrays, n_short=2, n_long=26, repeats=6,
            )

        sel = tuner.choose_one(op_key, _Runner(), time_tactic=time_tactic)
    if sel is not None:
        tile_k = sel["tile_k"]
    nsub = plan_meta.kv_chunk_size // tile_k
    if kv_dequant in ("e4m3", "int8"):
        assert ckv_cache.dtype == jnp.int8 and kpe_cache.dtype == jnp.int8, (
            "8-bit MLA caches must arrive as int8 containers"
        )
    if kv_dequant == "e4m3":
        assert tile_k % 4 == 0, (
            f"fp8 MLA needs tile_k % 4 == 0 (packed 4-byte decode), got {tile_k}"
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # flat [12*T] plan + kv_indices
        grid=(T, nsub),
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, d_ckv),
                lambda w, j, *s: (0, s[0][_QO_START * T + w] // tile_q, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_q, d_kpe),
                lambda w, j, *s: (0, s[0][_QO_START * T + w] // tile_q, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, d_ckv), lambda w, j, *s: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, _LANES), lambda w, j, *s: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile_k, d_ckv), ckv_cache.dtype),
            pltpu.VMEM((2, tile_k, d_kpe), kpe_cache.dtype),
            pltpu.SemaphoreType.DMA((2, tile_k // page_size)),
            pltpu.SemaphoreType.DMA((2, tile_k // page_size)),
            pltpu.VMEM((tile_q, d_ckv), jnp.float32),
            pltpu.VMEM((tile_q, _LANES), jnp.float32),
            pltpu.VMEM((tile_q, _LANES), jnp.float32),
        ],
    )
    import os as _os

    probe = _os.environ.get("FLASHINFER_TPU_KERNEL_PROBE") or None
    kernel = functools.partial(
        _mla_kernel,
        sm_scale=sm_scale,
        v_scale=v_scale,
        kv_dequant=kv_dequant,
        causal=causal,
        group=plan_meta.gqa_group,
        tile_q=tile_q,
        tile_k=tile_k,
        page_size=page_size,
        nsub=nsub,
        num_items=T,
        d_ckv=d_ckv,
        d_kpe=d_kpe,
        probe=probe,
    )
    partial_o, partial_lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, tile_q, d_ckv), q_ckv_packed.dtype),
            jax.ShapeDtypeStruct((T, tile_q, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 8-bit candidates are modeled under the wide budget, and a
            # pinned tile may exceed even that — raise the scoped limit
            # whenever we are beyond the tight bf16 model
            **({"vmem_limit_bytes": 100 * 1024 * 1024}
               if (tile_k not in cand_tks or ckv_cache.dtype.itemsize == 1)
               else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * tile_q * plan_meta.kv_chunk_size * d_ckv,
            bytes_accessed=(
                T * plan_meta.kv_chunk_size * (d_ckv + d_kpe)
                * ckv_cache.dtype.itemsize
            ),
            transcendentals=T * tile_q * plan_meta.kv_chunk_size,
        ),
        interpret=interpret,
    )(plan_arrays.reshape(-1), kv_indices, q_ckv_packed, q_pe_packed,
      ckv_cache, kpe_cache)
    return partial_o, partial_lse[..., 0]


class BatchMLAPagedAttentionWrapper:
    """Reference parity: flashinfer/mla.py:85 (plan :221, run :324).

    plan(qo_indptr, kv_indptr, kv_indices, kv_len_arr, num_heads,
         head_dim_ckv, head_dim_kpe, page_size, causal, sm_scale)
    run(q_nope [nnz, h, 512], q_pe [nnz, h, 64], ckv_cache
        [pages, page_size, 512], kpe_cache [pages, page_size, 64])
    """

    def __init__(self, *, backend: str = "auto", tile_q: Optional[int] = None,
                 tile_k: Optional[int] = None):
        self._backend = backend
        self._tile_q = tile_q
        self._tile_k = tile_k
        self._state = None

    def plan(
        self,
        qo_indptr,
        kv_indptr,
        kv_indices,
        kv_len_arr,
        num_heads: int,
        head_dim_ckv: int,
        head_dim_kpe: int,
        page_size: int,
        *,
        causal: bool = False,
        sm_scale: Optional[float] = None,
        kv_chunk_size: Optional[int] = None,
        **_ignored,
    ):
        qo_indptr = np.asarray(qo_indptr, np.int64)
        kv_indptr = np.asarray(kv_indptr, np.int64)
        kv_indices_np = np.asarray(kv_indices, np.int64)
        kv_lens = np.asarray(kv_len_arr, np.int64)
        batch = len(qo_indptr) - 1
        if sm_scale is None:
            sm_scale = 1.0 / math.sqrt(head_dim_ckv + head_dim_kpe)
        group = num_heads

        qo_lens = qo_indptr[1:] - qo_indptr[:-1]
        nnz = int(qo_indptr[-1])
        avg_packed = max(1, int((qo_lens * group).mean())) if batch else 1
        tile_q = self._tile_q or min(128, max(8, next_power_of_2(avg_packed)))
        tile_q = min(128, max(tile_q, 8))

        packed_lens = qo_lens * group
        padded_lens = round_up_np(packed_lens, tile_q)
        padded_indptr = np.concatenate([[0], np.cumsum(padded_lens)])
        total_padded = int(padded_indptr[-1])
        bucket_rows = _bucket(max(total_padded, tile_q))

        plan = plan_attention(
            padded_indptr,
            kv_lens,
            qo_token_lens=qo_lens,
            gqa_group=group,
            kv_indptr=kv_indptr,
            page_size=page_size,
            tile_q=tile_q,
            kv_chunk_size=kv_chunk_size,
            causal=causal,
        )

        rows = np.arange(bucket_rows)
        req_of_row = np.clip(
            np.searchsorted(padded_indptr, rows, side="right") - 1, 0, batch - 1
        )
        local = rows - padded_indptr[req_of_row]
        valid_row = (local < packed_lens[req_of_row]) & (rows < total_padded)
        token = qo_indptr[req_of_row] + local // group
        g = local % group
        row_src = np.where(valid_row, token * group + g, 0).astype(np.int32)

        tg = np.arange(nnz * group)
        tok = tg // group
        gg = tg % group
        req_of_tok = np.clip(
            np.searchsorted(qo_indptr, tok, side="right") - 1, 0, batch - 1
        )
        out_map = (
            padded_indptr[req_of_tok] + (tok - qo_indptr[req_of_tok]) * group + gg
        ).astype(np.int32)

        cap = _bucket(max(len(kv_indices_np), 1))
        padded_idx = np.zeros(cap, np.int32)
        padded_idx[: len(kv_indices_np)] = kv_indices_np
        merge_src = build_merge_src(plan.merge_out_row, bucket_rows)
        meta = PlanMeta(
            tile_q=plan.tile_q,
            kv_chunk_size=plan.kv_chunk_size,
            num_work_items=plan.num_work_items,
            page_size=page_size,
            gqa_group=plan.gqa_group,
            bucket_rows=bucket_rows,
            nnz=nnz,
            num_qo_heads=num_heads,
            num_kv_heads=1,
            head_dim_qk=head_dim_ckv + head_dim_kpe,
            head_dim_vo=head_dim_ckv,
            causal=causal,
            sm_scale=sm_scale,
            window_left=-1,
            ragged=False,
            kv_indices_len=int(padded_idx.shape[0]),
            max_splits=int(merge_src.shape[1]),
        )
        device_plan = DevicePlan.build(
            meta,
            dict(
                plan=plan.prefetch_arrays(),
                kv_indices=padded_idx,
                row_src=row_src,
                row_valid=valid_row,
                merge_out_row=plan.merge_out_row,
                out_map=out_map,
                merge_src=merge_src,
            ),
        )
        self._state = PlanState(
            plan=plan,
            device_plan=device_plan,
            host=dict(
                qo_indptr=qo_indptr,
                kv_indptr=kv_indptr,
                kv_indices=kv_indices_np,
                kv_lens=kv_lens,
            ),
        )
        return self

    def run(
        self,
        q_nope: jax.Array,
        q_pe: jax.Array,
        ckv_cache: jax.Array,
        kpe_cache: jax.Array,
        *,
        return_lse: bool = False,
        interpret: Optional[bool] = None,
        ckv_scale: float = 1.0,
        kpe_scale: float = 1.0,
        cache_dtype: str = "e4m3",
    ):
        """ckv_scale/kpe_scale: 8-bit cache dequant scales (the reference's
        trtllm MLA decode takes bmm1_scale/bmm2_scale — decode.py:2298).
        FP8 caches arrive as int8 bit containers (or float8_e4m3fn, which
        costs a one-off bitcast copy); scales fold into sm_scale / the
        output epilogue — zero per-element dequant multiplies.

        cache_dtype disambiguates int8 containers: "e4m3" (default) treats
        the bytes as e4m3 bit patterns (9-int32-op in-kernel bit decode);
        "int8" treats them as LINEAR int8 (value = q * ckv_scale) — the
        TPU-native 8-bit container (pre-v6 TPUs have no fp8 hardware; the
        int8->bf16 convert is one VPU op, so linear int8 streams at ~the
        bf16 compute rate while halving HBM traffic)."""
        st = self._state
        assert st is not None, "call plan() before run()"
        backend = self._backend
        if backend == "auto":
            backend = "pallas" if on_tpu() else "reference"
        if backend == "reference" and interpret is None:
            return self._run_reference(
                q_nope, q_pe, ckv_cache, kpe_cache, return_lse,
                ckv_scale=ckv_scale, kpe_scale=kpe_scale,
            )

        nnz, h, d_ckv = q_nope.shape
        d_kpe = q_pe.shape[-1]
        if cache_dtype not in ("e4m3", "int8"):
            raise ValueError(f"unknown cache_dtype {cache_dtype!r}")
        if ckv_cache.dtype == jnp.float8_e4m3fn:
            ckv_cache = jax.lax.bitcast_convert_type(ckv_cache, jnp.int8)
            kpe_cache = jax.lax.bitcast_convert_type(kpe_cache, jnp.int8)
            cache_dtype = "e4m3"  # explicit fp8 dtype overrides the flag
        kv_dequant = cache_dtype if ckv_cache.dtype == jnp.int8 else None

        # Mosaic can only DMA full 128-lane tiles: pad the rope part (64
        # lanes) to 128. Zero pad lanes contribute 0 to the dot (int8 zero
        # bytes decode to e4m3 zero). Callers can avoid the per-run pad copy
        # by storing kpe 128-padded — q_pe and the cache pad independently
        # to the shared lane-aligned width, so a pre-padded cache is used
        # as-is rather than re-padded.
        d_kpe_pad = max(-(-d_kpe // _LANES) * _LANES, kpe_cache.shape[-1])
        if q_pe.shape[-1] != d_kpe_pad:
            q_pe = jnp.pad(
                q_pe, ((0, 0), (0, 0), (0, d_kpe_pad - q_pe.shape[-1]))
            )
        if kpe_cache.shape[-1] != d_kpe_pad:
            kpe_cache = jnp.pad(
                kpe_cache,
                ((0, 0), (0, 0), (0, d_kpe_pad - kpe_cache.shape[-1])),
            )
        d_kpe = d_kpe_pad

        # scale folding: s = sm_scale*(q_ckv.ckv*ckv_scale + q_pe.kpe*
        # kpe_scale). Pre-scaling q_pe by kpe_scale/ckv_scale makes both
        # dots share one factor, which folds into sm_scale; ckv_scale also
        # dequants V (ckv IS V) via the output epilogue. The fp8 bit decode
        # leaves values at 2^-120 scale: q carries 2^60 in-kernel, sm_scale
        # and v_scale carry the other 2^60 each (kernels/paged.py:86).
        sm_scale = st.sm_scale
        v_scale = 1.0
        if kv_dequant == "e4m3":
            if kpe_scale != ckv_scale:
                q_pe = q_pe * q_pe.dtype.type(kpe_scale / ckv_scale)
            sm_scale = sm_scale * ckv_scale * _E4M3_SHIFT_SCALE
            v_scale = ckv_scale * _E4M3_SHIFT_SCALE
        elif kv_dequant == "int8":
            # linear int8: same folding, no 2^60 bit-decode shifts
            if kpe_scale != ckv_scale:
                q_pe = q_pe * q_pe.dtype.type(kpe_scale / ckv_scale)
            sm_scale = sm_scale * ckv_scale
            v_scale = ckv_scale

        def pack(arr, d):
            # kvz=1: rows are (token, head) pairs
            q_r = arr.reshape(1, nnz * h, d)
            out = jnp.take(q_r, st.row_src, axis=1)
            return jnp.where(st.row_valid[None, :, None], out, 0)

        partial_o, partial_lse = _mla_paged_run(
            pack(q_nope, d_ckv), pack(q_pe, d_kpe),
            ckv_cache, kpe_cache, st.kv_indices, st.plan_arrays,
            plan_meta=st.plan, causal=st.causal, sm_scale=sm_scale,
            v_scale=v_scale, kv_dequant=kv_dequant,
            tile_k=self._tile_k, interpret=interpret,
        )
        T, tile_q, dv = partial_o.shape
        merged_v, merged_s = gather_merge_states(
            partial_o[:, None], partial_lse[:, None], st.merge_src, tile_q
        )
        out = jnp.take(merged_v[:, 0], st.out_map, axis=0).reshape(nnz, h, dv)
        if return_lse:
            lse = jnp.take(merged_s[:, 0], st.out_map, axis=0).reshape(nnz, h)
            return out, lse
        return out

    def _run_reference(self, q_nope, q_pe, ckv_cache, kpe_cache, return_lse,
                       ckv_scale=1.0, kpe_scale=1.0):
        from flashinfer_tpu.ops.fp8 import e4m3_bits_to_bf16

        st = self._state
        h = st.host
        nnz, heads, d_ckv = q_nope.shape
        outs, lses = [], []
        page_size = ckv_cache.shape[1]

        def deq(c, scale):
            if c.dtype == jnp.float8_e4m3fn:
                c = jax.lax.bitcast_convert_type(c, jnp.int8)
            if c.dtype == jnp.int8:
                c = e4m3_bits_to_bf16(c).astype(jnp.float32) * scale
            return c

        ckv_cache = deq(ckv_cache, ckv_scale)
        kpe_cache = deq(kpe_cache, kpe_scale)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        for r in range(len(h["qo_indptr"]) - 1):
            q_r = q[h["qo_indptr"][r] : h["qo_indptr"][r + 1]]
            kv_len = int(h["kv_lens"][r])
            pages = h["kv_indices"][h["kv_indptr"][r] : h["kv_indptr"][r + 1]]
            ckv = ckv_cache[pages].reshape(-1, d_ckv)[:kv_len]
            kpe = kpe_cache[pages].reshape(-1, q_pe.shape[-1])[:kv_len]
            k_r = jnp.concatenate([ckv, kpe], axis=-1)[:, None, :]
            v_r = ckv[:, None, :]
            o, lse = attention_reference(
                q_r, k_r, v_r, causal=st.causal, sm_scale=st.sm_scale
            )
            outs.append(o)
            lses.append(lse)
        out = jnp.concatenate(outs, 0)
        if return_lse:
            return out, jnp.concatenate(lses, 0)
        return out
