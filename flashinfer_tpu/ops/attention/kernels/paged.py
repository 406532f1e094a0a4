"""Batch paged/ragged attention Pallas kernel — the plan/run "run" stage.

Reference parity: BatchPrefillWithPagedKVCacheDispatched
(include/flashinfer/attention/prefill.cuh:2551), BatchDecodeWithPagedKVCache
(decode.cuh:741) and the persistent holistic kernel (persistent.cuh:177).
One TPU kernel covers all three: the host planner (scheduler/plan.py) turns
any mix of prefill/append/decode requests into uniform (request × qo_tile ×
kv_chunk) work items, and this kernel executes the padded work list — the
TPU analogue of the reference's CUDA-graph-capturable persistent run stage.

TPU-first design decisions:
  * GQA head packing: q rows are (token, group-head) pairs
    (packed_qo_len = qo_len * group, the reference's scheduler.cuh:506 trick)
    so decode tiles still feed the MXU [tile_q, d] x [d, tile_k].
  * Page gather: TPU has no pointer-chasing loads, so pages are gathered by
    explicit double-buffered DMA — while sub-tile j computes, the DMAs for
    the *next grid step* (possibly a different work item) are already in
    flight; descriptors live in SMEM via scalar prefetch so next-step
    addresses are computable ahead of time. This is the software analogue of
    the reference's cp.async pipeline, expressed at page granularity.
  * Each page is fetched ONCE for all KV heads (one contiguous
    [kvh, page_size, d] DMA in HND layout) and the head dimension is an
    unrolled loop inside the kernel — KV HBM traffic is read exactly once,
    which is what the >=85%-of-roofline target requires.
  * Split-KV: every work item writes a (v, s) partial state; a segment
    softmax-merge (state.py) combines chunks. Padding items emit s = -inf
    (the merge identity).

Cache layout: HND [num_pages, num_kv_heads, page_size, head_dim] makes a
page fully contiguous — one efficient DMA. NHD [num_pages, page_size,
num_kv_heads, head_dim] is also one DMA per page (different buffer layout);
per-head slices inside VMEM are strided, so HND remains the fast path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashinfer_tpu.ops.attention.variants import AttentionVariant, DefaultAttention
from flashinfer_tpu.scheduler.plan import AttentionPlan
from flashinfer_tpu.utils import TensorLayout, default_interpret

__all__ = ["batch_paged_attention_run"]

_NEG_INF = float("-inf")
_LANES = 128
_LOG2E = 1.4426950408889634  # log2(e)
_LN2 = 0.6931471805599453

# scalar-prefetch operand order (must match AttentionPlan.prefetch_arrays)
_NUM_PLAN_ARRAYS = 12
(
    _REQ,
    _QO_TILE,
    _KV_TILE,
    _QO_START,
    _QO_LEN,
    _KV_START,
    _KV_END,
    _KV_PAGE_START,
    _NUM_SPLITS,
    _Q_POS_BASE,
    _DMA_NEW,
    _DMA_SLOT,
) = range(_NUM_PLAN_ARRAYS)
_KV_INDICES = _NUM_PLAN_ARRAYS  # + kv_indices as the 13th prefetch operand


# The packed e4m3 decode produces values scaled by 2^-120 (no exponent
# rebias in the bit path). The kernel recovers true scale without touching
# the big KV tiles: Q is pre-multiplied by 2^60 (so QK^T products stay in
# f32 normal range) and sm_scale carries the other 2^60; on the V side the
# softmax exp2 argument gets +60 (P becomes 2^60-scaled — free) and the
# finalize folds 2^120 into v_scale. All fixups ride tiny [tile_q, *]
# arrays or scalars; nothing per-KV-element.
_E4M3_EXP_SHIFT = 60
_E4M3_SHIFT_SCALE = 2.0**_E4M3_EXP_SHIFT


def _e4m3_decode_rows(x8: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Decode e4m3fn bits (int8 container) [rows, d] into two bf16 halves
    ([rows/2, d] each) at 2^-120 scale: (even_rows, odd_rows). Treated as a
    virtual concat along rows, output row r maps to input row 2r for
    r < rows/2, else 2(r-rows/2)+1 — but the halves are returned separately
    so the MXU consumes them directly (concatenating the small f32 logits is
    ~16x cheaper than concatenating the bf16 KV tile).

    This is the fast in-kernel path (vs ops/fp8.py e4m3_bits_to_bf16, which
    widens every byte to int32 — 4x the VPU lanes). pltpu.bitcast packs 4
    sublane bytes per int32 word (measured semantics on v5e: word s = rows
    4s..4s+3, little-endian); byte pairs (b0,b2) and (b1,b3) are
    masked/shifted into bf16 bit positions entirely in int32 (v5e has no
    16-bit vector shifts/multiplies/compares): 9 int32 ops per 4 decoded
    elements, ~2.25 VPU-lane-ops/element vs ~9 for the widening path.

    No exponent rebias is added: e=0 bytes land on bf16 denormals, so zeros
    decode exactly and e4m3 denormals either decode exactly or flush to
    zero downstream (hardware FTZ) — error < 2^-9, far below e4m3
    quantization noise. e4m3 NaN (never emitted by the library's
    quantizers) decodes as a denormal-range value rather than 480.

    Attention is invariant to a KV row permutation: K rows permute logits
    columns, V rows permute in lockstep, and softmax reduces over that
    axis. Only position-dependent masking needs the permuted coordinates —
    see _permute_kv_offsets.
    """
    x = pltpu.bitcast(x8, jnp.int32)  # [rows/4, d]
    em_e = (x << 4) & 0x07F007F0
    out_e = ((x & 0x00800080) << 8) | em_e
    em_o = jax.lax.shift_right_logical(x, 4) & 0x07F007F0
    out_o = (x & jnp.int32(-0x7FFF8000)) | em_o  # signs already in place
    even = pltpu.bitcast(out_e, jnp.bfloat16)  # input rows 0,2,4,...
    odd = pltpu.bitcast(out_o, jnp.bfloat16)  # input rows 1,3,5,...
    return even, odd


def _permute_kv_offsets(col: jax.Array, tile_k: int) -> jax.Array:
    """Map a within-tile kv index to the original row held at that position
    after _e4m3_decode_rows' even/odd permutation."""
    half = tile_k // 2
    return jnp.where(col < half, 2 * col, 2 * (col - half) + 1)


def _variant_plumbing(variant_params):
    """Flatten variant params into full-array VMEM inputs (whole-leaf blocks;
    hooks do per-head indexing themselves with head_idx)."""
    if variant_params is None:
        return [], [], lambda loaded: None
    leaves, treedef = jax.tree_util.tree_flatten(variant_params)
    arrays, specs, metas = [], [], []
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        flat = leaf.reshape(1, -1) if leaf.ndim < 2 else leaf
        specs.append(
            pl.BlockSpec(
                flat.shape,
                # *s swallows the scalar-prefetch refs PrefetchScalarGridSpec
                # hands every index map; n= binds THIS leaf's ndim (a bare
                # closure would late-bind the loop variable)
                lambda w, j, *s, n=flat.ndim: (0,) * n,
                memory_space=pltpu.VMEM,
            )
        )
        metas.append(leaf.shape)
        arrays.append(flat)

    def rebuild(loaded):
        out = [val.reshape(shape) for val, shape in zip(loaded, metas)]
        return jax.tree_util.tree_unflatten(treedef, out)

    return arrays, specs, rebuild


def _paged_kernel(
    *refs,
    num_variant_leaves: int,
    rebuild_params,
    has_mask: bool,
    variant: AttentionVariant,
    sm_scale: float,
    v_scale: float,
    kv_dequant: Optional[str],
    window_left: int,
    causal: bool,
    group: int,
    tile_q: int,
    tile_k: int,
    page_size: int,
    nsub: int,
    num_kv_heads: int,  # kv heads in THIS call's group (h_blk)
    head_offset: int,  # first global kv-head index of the group
    layout: TensorLayout,
    num_items: int,
    ragged: bool,
    kv_major: bool,
    head_loop: bool = False,
    probe: Optional[str] = None,
):
    # --- unpack refs ---
    # ONE flat [12*T] plan operand: each extra scalar-prefetch operand
    # costs measured tens of us of per-call prologue (13 operands =
    # ~0.1 ms/call = the entire kernel time at decode shapes). Mosaic
    # only takes 1-D scalar prefetch, so rows are computed offsets.
    idx = 0
    plan_flat = refs[idx]; idx += 1

    class _PlanRow:
        __slots__ = ("base",)

        def __init__(self, i):
            self.base = i * num_items

        def __getitem__(self, w):
            return plan_flat[self.base + w]

    plan_refs = [_PlanRow(i) for i in range(_NUM_PLAN_ARRAYS)]
    kv_indices_ref = refs[idx]; idx += 1
    q_ref = refs[idx]; idx += 1
    k_hbm = refs[idx]; idx += 1
    v_hbm = refs[idx]; idx += 1
    if has_mask:
        mask_ref = refs[idx]; idx += 1
    variant_refs = refs[idx : idx + num_variant_leaves]
    idx += num_variant_leaves
    out_ref, lse_ref = refs[idx : idx + 2]
    idx += 2
    k_buf, v_buf, sem_k, sem_v, acc_ref, m_ref, l_ref = refs[idx : idx + 7]

    w = pl.program_id(0)
    j = pl.program_id(1)
    ppst = tile_k // page_size  # pages per sub-tile
    flat = w * nsub + j
    total_steps = num_items * nsub

    def descriptors(wi, ji):
        kv_s = plan_refs[_KV_START][wi]
        kv_e = plan_refs[_KV_END][wi]
        page0 = plan_refs[_KV_PAGE_START][wi]
        sub_start = ji * tile_k  # within-chunk token offset
        remaining = kv_e - kv_s - sub_start
        return page0, sub_start, remaining

    # VMEM KV buffers: HND caches use [h_blk, tile_k, d] (head axis is the
    # slow HBM dim — head-group slices are free). Ragged/NHD caches keep the
    # HBM layout [tile_k, kvh, d]: the head axis rides the sublane tiling in
    # HBM, so sub-tile head slices can't be DMA'd — all heads ship in one
    # full-width copy (head grouping disabled by choose_tiles).
    def start_dmas(wi, ji, slot):
        page0, sub_start, remaining = descriptors(wi, ji)
        hsl = pl.ds(head_offset, num_kv_heads)  # this call's kv-head group
        if ragged:
            # contiguous KV: one DMA of tile_k rows from the global token
            # offset (page0 carries kv_indptr[r] + kv_start here)
            @pl.when(remaining > 0)
            def _():
                row0 = page0 + sub_start
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(row0, tile_k)], k_buf.at[slot],
                    sem_k.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(row0, tile_k)], v_buf.at[slot],
                    sem_v.at[slot, 0],
                ).start()
            return
        for p in range(ppst):
            @pl.when(p * page_size < remaining)
            def _():
                page_id = kv_indices_ref[page0 + sub_start // page_size + p]
                psl = pl.ds(p * page_size, page_size)
                if layout == TensorLayout.HND:
                    # page head-group: [h_blk, page_size, d] contiguous
                    k_src, k_dst = k_hbm.at[page_id, hsl], k_buf.at[slot, :, psl, :]
                    v_src, v_dst = v_hbm.at[page_id, hsl], v_buf.at[slot, :, psl, :]
                else:  # NHD page [page_size, kvh, d], full width
                    k_src, k_dst = k_hbm.at[page_id], k_buf.at[slot, psl, :, :]
                    v_src, v_dst = v_hbm.at[page_id], v_buf.at[slot, psl, :, :]
                pltpu.make_async_copy(k_src, k_dst, sem_k.at[slot, p]).start()
                pltpu.make_async_copy(v_src, v_dst, sem_v.at[slot, p]).start()

    def wait_dmas(wi, ji, slot):
        page0, sub_start, remaining = descriptors(wi, ji)
        if ragged:
            @pl.when(remaining > 0)
            def _():
                pltpu.make_async_copy(
                    k_buf.at[slot], k_buf.at[slot], sem_k.at[slot, 0]
                ).wait()
                pltpu.make_async_copy(
                    v_buf.at[slot], v_buf.at[slot], sem_v.at[slot, 0]
                ).wait()
            return
        for p in range(ppst):
            @pl.when(p * page_size < remaining)
            def _():
                psl = pl.ds(p * page_size, page_size)
                if layout == TensorLayout.HND:
                    k_dst = k_buf.at[slot, :, psl, :]
                    v_dst = v_buf.at[slot, :, psl, :]
                else:
                    k_dst = k_buf.at[slot, psl, :, :]
                    v_dst = v_buf.at[slot, psl, :, :]
                pltpu.make_async_copy(k_dst, k_dst, sem_k.at[slot, p]).wait()
                pltpu.make_async_copy(v_dst, v_dst, sem_v.at[slot, p]).wait()

    # probe: instrumented-build decomposition (reference profiler.cuh role;
    # TPU Pallas exposes no in-kernel clock, so benchmarks/kernel_decomp.py
    # times stripped variants instead of recording timestamps): "grid" =
    # grid walk only, "dma" = DMA pipeline only, "compute" = body on
    # resident garbage (no DMA).
    do_dma = probe not in ("grid", "compute")
    do_compute = probe not in ("grid", "dma")

    # --- pipeline: warm up on the very first step, then prefetch next ---
    if not do_dma:
        slot = plan_refs[_DMA_SLOT][w] if (kv_major and nsub == 1) else flat % 2
    elif kv_major and nsub == 1:
        # kv-major dedup mode (kv_major_order): consecutive work items that
        # share a KV range reuse the resident VMEM tile — the prefill HBM
        # saving (KV is read once per request, not once per qo tile).
        slot = plan_refs[_DMA_SLOT][w]

        @pl.when(flat == 0)
        def _warmup():
            start_dmas(w, j, slot)

        @pl.when(flat + 1 < total_steps)
        def _prefetch_next():
            @pl.when(plan_refs[_DMA_NEW][w + 1] == 1)
            def _():
                start_dmas(w + 1, 0, plan_refs[_DMA_SLOT][w + 1])

        @pl.when(plan_refs[_DMA_NEW][w] == 1)  # dma_new[0] is always 1
        def _wait_fresh():
            wait_dmas(w, j, slot)
    else:
        @pl.when(flat == 0)
        def _warmup():
            start_dmas(w, j, 0)

        @pl.when(flat + 1 < total_steps)
        def _prefetch_next():
            nf = flat + 1
            start_dmas(nf // nsub, nf % nsub, nf % 2)

        slot = flat % 2
        wait_dmas(w, j, slot)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    page0, sub_start, remaining = descriptors(w, j)
    valid_item = plan_refs[_REQ][w] >= 0

    def _body(masked: bool):
        params = rebuild_params([r[:] for r in variant_refs])

        # shared position/mask tiles (head-independent parts)
        qo_local0 = plan_refs[_QO_TILE][w] * tile_q
        need_pos = masked or (
            variant.logits_transform is not None
            or variant.logits_mask is not None
        )
        if need_pos:
            row = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 1)
            if kv_dequant == "e4m3":
                # packed decode permutes KV rows; positions/masks must use
                # permuted coordinates
                col = _permute_kv_offsets(col, tile_k)
            q_tok = plan_refs[_Q_POS_BASE][w] + (qo_local0 + row) // group
            kv_pos = plan_refs[_KV_START][w] + sub_start + col
        if masked:
            vrow = jax.lax.broadcasted_iota(jnp.int32, (tile_k, 1), 0)
            if kv_dequant == "e4m3":
                vrow = _permute_kv_offsets(vrow, tile_k)
            base_mask = col < remaining
            if causal:
                base_mask = jnp.logical_and(base_mask, kv_pos <= q_tok)
            if window_left >= 0:
                base_mask = jnp.logical_and(
                    base_mask, kv_pos > q_tok - window_left - 1
                )
            col_valid = vrow < remaining

        # exp = exp2 with log2(e) folded into the logits; when no
        # logits_transform hook needs natural-scale logits, fold log2(e)
        # straight into sm_scale (one fewer pass over [tile_q, tile_k])
        fold_log2e = variant.logits_transform is None
        s_scale = sm_scale * _LOG2E if fold_log2e else sm_scale
        fp8 = kv_dequant == "e4m3"
        half = tile_k // 2

        def _one_head(h):
            q = q_ref[h]  # [tile_q, d]
            if ragged or layout == TensorLayout.NHD:
                # per-head strided slices relayout in VMEM; at LARGE kv
                # this makes NHD ~4x slower than HND (measured 2.6-3.0 vs
                # 0.6-0.7 ms at b64 kv2048; an explicit hoisted swapaxes
                # of the whole tile costs the same — the sublane shuffle
                # IS the cost). Short decode tiles (engine regime) are
                # unaffected; long-context NHD is a known round-6 lever.
                k = k_buf[slot, :, h, :]  # [tile_k, d]
                v = v_buf[slot, :, h, :]
            else:
                k = k_buf[slot, h]
                v = v_buf[slot, h]
            if fp8:
                # fp8 cache shipped as int8 bits: pre-v6 TPUs have no hw
                # fp8; packed bit decode into two row-halves at 2^-120
                # scale (masks above are in permuted coordinates; scale is
                # recovered via Q/sm_scale/exp2-offset folds — see
                # _e4m3_decode_rows)
                ke, ko = _e4m3_decode_rows(k)
                ve, vo = _e4m3_decode_rows(v)
            elif k.dtype != q.dtype:  # int8/other: plain upcast
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)

            qf = q
            if variant.query_transform is not None:
                qf = variant.query_transform(params, qf.astype(jnp.float32))
            if fp8:
                # 2^60 on the q tile (tiny) keeps QK products in f32 normal
                # range; sm_scale carries the other 2^60
                qf = (qf * qf.dtype.type(_E4M3_SHIFT_SCALE)).astype(ke.dtype)
                dn = (((1,), (1,)), ((), ()))
                s = jnp.concatenate(
                    [
                        jax.lax.dot_general(
                            qf, ke, dn, preferred_element_type=jnp.float32
                        ),
                        jax.lax.dot_general(
                            qf, ko, dn, preferred_element_type=jnp.float32
                        ),
                    ],
                    axis=1,
                )
            else:
                s = jax.lax.dot_general(
                    qf, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # k_scale folds into the softmax scale; v_scale into the output
            s = s * s_scale

            if variant.logits_transform is not None or variant.logits_mask is not None:
                head_idx = (head_offset + h) * group + (
                    row % group if group > 1 else jnp.zeros_like(row))
                if variant.logits_transform is not None:
                    s = variant.logits_transform(params, s, q_tok, kv_pos, head_idx)
                if variant.logits_mask is not None:
                    assert masked, "variant mask forces the masked body"
            if masked:
                mask = base_mask
                if variant.logits_mask is not None:
                    mask = jnp.logical_and(
                        mask, variant.logits_mask(params, q_tok, kv_pos, head_idx)
                    )

            # online softmax in base 2: exp2 is the hardware-native
            # transcendental; m/l state lives in the base-2 domain,
            # converted at finalize
            if masked:
                if has_mask:
                    # plan-time-legalized custom/multi-item mask tile
                    # (columns pre-permuted by the run wrapper for fp8
                    # caches). Applied as its own where on the logits:
                    # AND-ing it into the bool mask chain trips a Mosaic
                    # i1-relayout bug (replicated->distributed i1 vectors)
                    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
                s = jnp.where(mask, s if fold_log2e else s * _LOG2E, _NEG_INF)
            elif not fold_log2e:
                s = s * _LOG2E
            m_prev = m_ref[h]  # [tile_q, LANES]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
            if fp8:
                # +60 on the exp2 argument makes P 2^60-scaled for free, so
                # P @ V(2^-120) accumulates at 2^-60 — safely in f32 normal
                # range; finalize rescales l by 2^-60 and v_scale carries
                # the last 2^60
                p = jnp.exp2(s - (m_safe[:, :1] - _E4M3_EXP_SHIFT))
            else:
                p = jnp.exp2(s - m_safe[:, :1])
            if masked:
                # mathematically redundant (exp2(-inf - finite) == 0) but
                # measurably FASTER on v5e: the explicit zeroing lets Mosaic
                # select on the mask register instead of special-casing -inf
                # through exp2 (removing it cost ~0.2 ms on fp8 b64/kv2048)
                p = jnp.where(mask, p, 0.0)
            alpha = jnp.where(jnp.isneginf(m_prev), 0.0, jnp.exp2(m_prev - m_safe))
            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[h] = m_new
            # rows of v beyond the valid kv range hold whatever the DMA left
            # behind (NaN in interpret mode); 0 * NaN = NaN, so zero them.
            # Interior tiles (masked=False) have remaining >= tile_k, so
            # every row is real data.
            if fp8:
                pb = p.astype(ve.dtype)
                dn0 = (((1,), (0,)), ((), ()))
                ve_s = jnp.where(col_valid[:half], ve, 0) if masked else ve
                vo_s = jnp.where(col_valid[half:], vo, 0) if masked else vo
                pv = jax.lax.dot_general(
                    pb[:, :half], ve_s, dn0,
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    pb[:, half:], vo_s, dn0,
                    preferred_element_type=jnp.float32,
                )
            else:
                v_safe = jnp.where(col_valid, v, 0) if masked else v
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v_safe, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[h] = acc_ref[h] * alpha[:, :1] + pv

        if head_loop:
            # fori_loop over kv heads: one head's [tile_q, tile_k] softmax
            # temporaries are live at a time (the static unroll stacks ~3
            # f32 temps PER HEAD in scoped VMEM — tile_candidates' unroll
            # model), so prefill tiles can keep every kv head resident and
            # the grid step carries h_blk x more MXU work per ~2 us of
            # per-step overhead. Refs are indexed with the traced h (legal:
            # leading untiled axes of VMEM refs).
            def _lbody(h, carry):
                _one_head(h)
                return carry

            jax.lax.fori_loop(0, num_kv_heads, _lbody, 0)
        else:
            for h in range(num_kv_heads):  # static unroll over kv heads
                _one_head(h)

    # dispatch: interior tiles (fully valid, causality can't bite) skip the
    # whole mask pipeline — the TPU analogue of the reference's
    # mask-free-interior-tile specialization (prefill.cuh hot loop)
    active = jnp.logical_and(valid_item, remaining > 0)
    # the dual interior/masked specialization doubles Mosaic's scoped-VMEM
    # stack (both branches' temps coexist); worth it only for small decode
    # tiles where the temps are tiny and the mask passes are a large
    # fraction of the VPU work
    can_skip_mask = (
        window_left < 0 and variant.logits_mask is None and not has_mask
        # small decode tiles: dual-body temps are tiny and the mask passes
        # are a large VPU fraction. head_loop prefill tiles: temps are
        # per-head (not stacked across the unroll) so both bodies fit, and
        # interior tiles skip ~6 full-tile mask passes — the win grows with
        # kv chunks per qo tile (long-context prefill)
        and (tile_q <= 64 or head_loop)
    )
    if not do_compute:
        pass
    elif can_skip_mask:
        interior = remaining >= tile_k
        if causal:
            min_q_tok = plan_refs[_Q_POS_BASE][w] + (
                plan_refs[_QO_TILE][w] * tile_q
            ) // group
            max_kv_pos = plan_refs[_KV_START][w] + sub_start + tile_k - 1
            interior = jnp.logical_and(interior, min_q_tok >= max_kv_pos)

        @pl.when(jnp.logical_and(active, interior))
        def _compute_interior():
            _body(masked=False)

        @pl.when(jnp.logical_and(active, jnp.logical_not(interior)))
        def _compute_masked():
            _body(masked=True)
    else:

        @pl.when(active)
        def _compute():
            _body(masked=True)

    @pl.when(j == nsub - 1)
    def _finalize():
        m = m_ref[:, :, :1]  # [kvh, tile_q, 1]
        l = l_ref[:, :, :1]
        if kv_dequant == "e4m3":
            # P ran 2^60-scaled (exp2 offset); bring l back to true scale so
            # acc/l lands at 2^-60 (normal f32) and v_scale (x2^60) finishes
            l = l * (2.0 ** -_E4M3_EXP_SHIFT)
        safe_l = jnp.where(l > 0, l, 1.0)
        out = acc_ref[:] / safe_l
        if v_scale != 1.0:  # fp8 V dequant, folded to one multiply per output
            out = out * v_scale
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        # m is in the base-2 domain; lse is natural-log by convention
        lse = jnp.where(l > 0, m_safe * _LN2 + jnp.log(safe_l), _NEG_INF)
        out_ref[0] = out.astype(out_ref.dtype)
        # compact lse layout [kvh, tile_q] (tile_q on lanes): 128x less HBM
        # traffic than broadcasting across a lane dim
        lse_ref[0] = lse[:, :, 0]


_VMEM_BUDGET = 10 * 1024 * 1024
# fori_loop-over-heads (prefill) candidates run under an explicit
# vmem_limit_bytes raise (see _finish_run) — same mechanism the fused
# sampler uses; v5e physical VMEM is 128M
_VMEM_BUDGET_WIDE = 72 * 1024 * 1024
_VMEM_LIMIT_WIDE = 100 * 1024 * 1024
# Per-head K+V tile byte cap for the head-loop prefill heuristic, anchored
# at the v5e A/B winner (tile_k=1024 at d=dv=128 bf16 -> 512 KiB/head):
# one full-chunk DMA per grid step leaves the Mosaic pipeline nothing to
# overlap (benchmarks/prefill_ab.py, docs/PERF.md round 3). Expressed in
# bytes so other dtypes/head dims inherit the measured DMA-granularity
# sweet spot rather than the raw element count; the autotuner still offers
# the uncapped candidates as tactics.
_HEAD_LOOP_TILE_K_BYTES_V5E = 1024 * (128 + 128) * 2


def tile_candidates(
    *,
    num_kv_heads: int,
    tile_q: int,
    d_pad: int,
    dv_pad: int,
    kv_itemsize: int,
    q_itemsize: int,
    page_size: int,
    kv_chunk_size: int,
    head_sliceable: bool,
    tile_k: Optional[int] = None,
    head_loop: bool = False,
    ragged: bool = False,
):
    """Enumerate VMEM-legal (h_blk, tile_k) choices, heuristic first.

    The kernel holds double-buffered KV tiles + softmax state for h_blk kv
    heads. HND caches (head axis is the slow HBM dim) can be processed in
    head groups — each group streams only its own cache slice, no extra
    traffic. Ragged/NHD caches cannot slice the head axis (it rides the
    sublane tiling in HBM), so all heads stay resident and tile_k shrinks
    instead. Shared with the wrapper's plan() so kv_chunk_size can be set to
    the resident tile size (nsub==1 -> kv-major DMA dedup active).

    head_loop=True models the kernel's fori_loop-over-heads body (one
    head's softmax temporaries live at a time instead of ~3 f32
    [tile_q, tile_k] temps PER unrolled head) under the raised
    ``vmem_limit_bytes`` cap — the prefill regime, where maximizing
    h_blk x tile_q x tile_k per grid step is what amortizes the ~2 us
    per-grid-step overhead.
    """
    budget = _VMEM_BUDGET_WIDE if head_loop else _VMEM_BUDGET
    tile_k = tile_k or kv_chunk_size
    tile_k = min(tile_k, kv_chunk_size)
    tile_k = max(tile_k - tile_k % page_size, page_size)

    def vmem_bytes(h, tk):
        kv_scr = 2 * tk * h * (d_pad + dv_pad) * kv_itemsize
        state = h * tile_q * (dv_pad + 2 * _LANES) * 4
        q_blk = 2 * h * tile_q * d_pad * q_itemsize
        out_blk = 2 * h * tile_q * (dv_pad * q_itemsize + 4)
        # Mosaic keeps the head-unrolled logits intermediates (s, p, masks)
        # live across the unroll — ~3 f32 [tile_q, tile_k] temps per head.
        # (The decode-tile dual-body specialization does NOT double this:
        # measured, e.g. fp8 h8/tq8/tk2048 with both bodies fits fine; the
        # one observed scoped-vmem blowout was the NHD strided-slice case,
        # modeled separately below.)
        # fori_loop mode: ~3 per-head temps (reused) + ~3 shared
        # position/mask tiles, x2ish for the dual interior/masked bodies
        # (Mosaic stacks both branches' temps).
        compute_tmp = (
            9 * tile_q * tk * 4 if head_loop else 3 * h * tile_q * tk * 4
        )
        # NHD buffers are sliced per head on a strided axis; Mosaic
        # materializes each [tile_k, d] head slice as a relayout copy, and
        # the unrolled copies stack (measured: 16M scoped at h=4 tk=1024
        # d=128 bf16 where the naive model said ~5M)
        nhd_tmp = 0
        if not head_sliceable and not ragged:
            nhd_tmp = 4 * h * tk * (d_pad + dv_pad) * kv_itemsize
        return kv_scr + state + q_blk + out_blk + compute_tmp + nhd_tmp

    def best_h(tk):
        h = num_kv_heads
        if head_sliceable:
            while h > 1 and (
                vmem_bytes(h, tk) > budget or num_kv_heads % h
            ):
                h -= 1
        return h if vmem_bytes(h, tk) <= budget else 0

    # candidate tiles: halvings of tile_k that divide the chunk; prefer
    # tk >= 512 (keeps split-partial/merge traffic low and DMAs large),
    # minimize the number of head-group calls, tie-break on larger tk
    cands = []
    tk = tile_k
    while True:
        h = best_h(tk)
        # cap pages-per-subtile at 64: each page uses a DMA semaphore pair
        # and the sflag memory space holds ~2KB of semaphores total; the
        # kernel also Python-unrolls the per-page DMA start/wait whens, so
        # an uncapped ppst (e.g. page_size=1 vector-sparse under a 256
        # chunk) explodes the program. The ragged path issues ONE DMA per
        # subtile — the cap does not apply there.
        if h and (ragged or tk // page_size <= 64):
            cands.append((tk, h))
        if (tk <= page_size or tk % 2
                or kv_chunk_size % (tk // 2)
                or (tk // 2) % page_size):
            break
        tk //= 2
    if not cands:
        # nothing fits the model's budget (e.g. NHD caches where the head
        # axis cannot be sliced): keep halving tile_k toward page_size so
        # the per-step footprint shrinks as far as the layout allows,
        # rather than handing Mosaic a guaranteed scoped-vmem OOM
        cap = tile_k if ragged else min(tile_k, page_size * 64)
        while (
            cap > page_size
            and vmem_bytes(num_kv_heads, cap) > budget
            and cap % 2 == 0
            and (cap // 2) % page_size == 0
            and kv_chunk_size % (cap // 2) == 0
        ):
            cap //= 2
        return [(num_kv_heads, cap)]
    if head_loop:
        # prefill regime, measured on v5e (benchmarks/prefill_ab.py).
        # b8 s1024 h16 d128: all-heads (h16,tk1024) 41.2 TFLOPs beats the
        # full-chunk (h8,tk2048) 19.9 despite the latter's nsub==1 DMA
        # dedup; monotone 41.2/27.5/17.4/11.3 for tk 1024/512/256/128.
        # b8 s1024 GQA 32/8: (8,1024) 22.4 beats (8,2048) 17.1 at the SAME
        # call count — a single full-chunk DMA per grid step leaves the
        # pipeline nothing to overlap. Order: fewest head-group calls,
        # then largest tile_k under the byte cap (1024 elems at the
        # measured d128 bf16 anchor).
        tk_cap = max(
            page_size,
            _HEAD_LOOP_TILE_K_BYTES_V5E // ((d_pad + dv_pad) * kv_itemsize),
        )
        calls = min(num_kv_heads // hh for _, hh in cands)
        pool = [c for c in cands if num_kv_heads // c[1] == calls]
        capped = [c for c in pool if c[0] <= tk_cap]
        tk, h = max(capped) if capped else min(pool)
    else:
        preferred = [c for c in cands if c[0] >= min(512, tile_k)]
        pool = preferred or cands
        calls = min(num_kv_heads // h for _, h in pool)
        pool = [c for c in pool if num_kv_heads // c[1] == calls]
        tk, h = max(pool)
    # heuristic winner first; remaining VMEM-legal candidates are the
    # autotuner's tactic space
    rest = sorted(
        [(hh, tt) for tt, hh in cands if (hh, tt) != (h, tk)],
        key=lambda c: -c[1],
    )
    return [(h, tk)] + rest


def choose_tiles(**kwargs) -> Tuple[int, int]:
    """Heuristic (h_blk, tile_k) — first entry of tile_candidates."""
    return tile_candidates(**kwargs)[0]


def batch_paged_attention_run(
    q_packed: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    kv_indices: jax.Array,
    plan_arrays: Tuple[jax.Array, ...],
    *,
    plan_meta: AttentionPlan,
    causal: bool,
    sm_scale: float,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    kv_dequant: Optional[str] = None,
    window_left: int = -1,
    tile_k: int = 512,
    variant: AttentionVariant = DefaultAttention,
    variant_params: Any = None,
    kv_layout: TensorLayout = TensorLayout.HND,
    ragged: bool = False,
    work_mask: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run the planned work list.

    Args:
      q_packed: [num_kv_heads, padded_rows, head_dim] — GQA-packed,
        per-request tile_q-aligned (see wrapper), zero-filled padding.
      k_cache/v_cache: HND [pages, kvh, page_size, d] (or NHD
        [pages, page_size, kvh, d]); if ragged=True, contiguous
        [total_kv + tile_k pad, kvh, d] and the plan's kv_page_start holds
        global token offsets.
      kv_indices: [max_pages] int32 page table, values pre-clamped to
        [0, num_pages).
      plan_arrays: AttentionPlan.prefetch_arrays() as device arrays.

    Returns:
      partial_o [T, num_kv_heads, tile_q, head_dim_vo] (q dtype),
      partial_lse [T, num_kv_heads, tile_q] f32 — merge with
      state.variable_length_merge_states / the wrapper's scatter-merge.
    """
    if interpret is None:
        interpret = default_interpret()
    num_kv_heads, padded_rows, d_pad = q_packed.shape
    if ragged:
        page_size = None  # set to tile_k below
        dv_pad = v_cache.shape[2]
        assert k_cache.shape[1] == num_kv_heads
    elif kv_layout == TensorLayout.HND:
        page_size = k_cache.shape[2]
        dv_pad = v_cache.shape[3]
        assert k_cache.shape[1] == num_kv_heads
    else:
        page_size = k_cache.shape[1]
        dv_pad = v_cache.shape[3]
        assert k_cache.shape[2] == num_kv_heads
    assert variant.use_softmax, "non-softmax variants: use the dense kernel"

    tile_q = plan_meta.tile_q
    group = plan_meta.gqa_group
    T = plan_meta.num_work_items
    sm_scale = sm_scale * k_scale  # fp8 K dequant folds into the scale
    if kv_dequant == "e4m3":
        # packed decode leaves K and V at 2^-60 scale (paged._e4m3_decode_rows)
        sm_scale = sm_scale * _E4M3_SHIFT_SCALE
        v_scale = v_scale * _E4M3_SHIFT_SCALE

    cand_kw = dict(
        num_kv_heads=num_kv_heads,
        tile_q=tile_q,
        d_pad=d_pad,
        dv_pad=dv_pad,
        kv_itemsize=k_cache.dtype.itemsize,
        q_itemsize=q_packed.dtype.itemsize,
        page_size=1 if ragged else page_size,
        kv_chunk_size=plan_meta.kv_chunk_size,
        head_sliceable=(not ragged and kv_layout == TensorLayout.HND),
        tile_k=None,  # prefer the full chunk resident (nsub==1 -> dedup)
        ragged=ragged,
    )
    cands = [(h, tk, False) for h, tk in tile_candidates(**cand_kw)]
    # prefill tiles (tile_q >= 256): also offer the fori_loop-over-heads
    # body, which keeps more (often all) kv heads resident per grid step —
    # fewer pallas calls and ~h_blk x the MXU work per grid-step overhead.
    # Decode tiles stay on the proven unrolled body.
    if (
        not ragged and kv_layout == TensorLayout.HND
        and tile_q >= 256 and num_kv_heads > 1
    ):
        loop_cands = [
            (h, tk, True)
            for h, tk in tile_candidates(**cand_kw, head_loop=True)
        ]

        def calls(c):
            return num_kv_heads // c[0]

        if loop_cands and (
            calls(loop_cands[0]) < calls(cands[0])
            or (
                calls(loop_cands[0]) == calls(cands[0])
                and loop_cands[0][0] * loop_cands[0][1]
                > cands[0][0] * cands[0][1]
            )
        ):
            cands = loop_cands + cands
        else:
            cands = cands + loop_cands
    h_blk, tile_k, head_loop = _select_tiles(
        cands,
        q_packed=q_packed, k_cache=k_cache, v_cache=v_cache,
        kv_indices=kv_indices, plan_arrays=plan_arrays,
        plan_meta=plan_meta, causal=causal, sm_scale=sm_scale,
        v_scale=v_scale, kv_dequant=kv_dequant, window_left=window_left,
        variant=variant, variant_params=variant_params,
        kv_layout=kv_layout, ragged=ragged, work_mask=work_mask,
        interpret=interpret, d_pad=d_pad, dv_pad=dv_pad,
        num_kv_heads=num_kv_heads, tile_q=tile_q,
    )
    return _execute_tiles(
        h_blk, tile_k, head_loop,
        q_packed=q_packed, k_cache=k_cache, v_cache=v_cache,
        kv_indices=kv_indices, plan_arrays=plan_arrays,
        plan_meta=plan_meta, causal=causal, sm_scale=sm_scale,
        v_scale=v_scale, kv_dequant=kv_dequant, window_left=window_left,
        variant=variant, variant_params=variant_params,
        kv_layout=kv_layout, ragged=ragged, work_mask=work_mask,
        interpret=interpret, d_pad=d_pad, dv_pad=dv_pad,
        num_kv_heads=num_kv_heads, tile_q=tile_q,
    )


def _execute_tiles(
    h_blk, tile_k, head_loop=False, *,
    q_packed, k_cache, v_cache, kv_indices, plan_arrays,
    plan_meta, causal, sm_scale, v_scale, kv_dequant, window_left, variant,
    variant_params, kv_layout, ragged, work_mask, interpret, d_pad, dv_pad,
    num_kv_heads, tile_q,
):
    page_size = tile_k if ragged else (
        k_cache.shape[2] if kv_layout == TensorLayout.HND else k_cache.shape[1]
    )
    nsub = plan_meta.kv_chunk_size // tile_k
    if kv_dequant == "e4m3":
        assert tile_k % 4 == 0, (
            f"fp8 KV needs tile_k % 4 == 0 (packed 4-byte decode), got {tile_k}"
        )
        if work_mask is not None:
            # kernel columns are row-permuted by the packed decode; sample
            # the mask at the permuted offsets (cheap XLA gather on the
            # byte mask, once per run)
            Tm, tqm, chunk_m = work_mask.shape
            perm = _permute_kv_offsets(jnp.arange(tile_k), tile_k)
            work_mask = work_mask.reshape(
                Tm, tqm, chunk_m // tile_k, tile_k
            )[..., perm].reshape(Tm, tqm, chunk_m)

    if h_blk < num_kv_heads:
        parts = []
        for h0 in range(0, num_kv_heads, h_blk):
            parts.append(
                _finish_run(
                    q_packed[h0 : h0 + h_blk], k_cache, v_cache, kv_indices,
                    plan_arrays, plan_meta=plan_meta, causal=causal,
                    sm_scale=sm_scale, v_scale=v_scale,
                    kv_dequant=kv_dequant, window_left=window_left,
                    tile_k=tile_k, nsub=nsub, page_size=page_size,
                    head_offset=h0, h_blk=h_blk, head_loop=head_loop,
                    variant=variant,
                    variant_params=variant_params, kv_layout=kv_layout,
                    ragged=ragged, interpret=interpret, d_pad=d_pad,
                    dv_pad=dv_pad, work_mask=work_mask,
                )
            )
        partial_o = jnp.concatenate([p[0] for p in parts], axis=1)
        partial_lse = jnp.concatenate([p[1] for p in parts], axis=1)
        return partial_o, partial_lse

    return _finish_run(
        q_packed, k_cache, v_cache, kv_indices, plan_arrays,
        plan_meta=plan_meta, causal=causal, sm_scale=sm_scale,
        v_scale=v_scale, kv_dequant=kv_dequant, window_left=window_left,
        tile_k=tile_k, nsub=nsub, page_size=page_size, head_offset=0,
        h_blk=num_kv_heads, head_loop=head_loop, variant=variant,
        variant_params=variant_params,
        kv_layout=kv_layout, ragged=ragged, interpret=interpret,
        d_pad=d_pad, dv_pad=dv_pad, work_mask=work_mask,
    )


def _select_tiles(cands, **ctx):
    """Pick (h_blk, tile_k) from the VMEM-legal candidates: persisted
    autotuner winner if present, else — inside an ``autotune()`` region on
    concrete (non-traced) arrays — profile every candidate with the
    differential bencher and persist the winner; else the heuristic
    (reference autotuner.py:349 choose_one wiring)."""
    if len(cands) == 1:
        return cands[0]
    from flashinfer_tpu.autotuner import AutoTuner, TunableRunner

    pm = ctx["plan_meta"]
    op_key = (
        f"paged_attn::h{ctx['num_kv_heads']}xd{ctx['d_pad']}"
        f"x{ctx['dv_pad']}::tq{ctx['tile_q']}::chunk{pm.kv_chunk_size}"
        f"::T{pm.num_work_items}::kv{ctx['k_cache'].dtype.name}"
        f"::{ctx['kv_dequant']}::{'ragged' if ctx['ragged'] else ctx['kv_layout'].name}"
    )
    tactics = [
        {"h_blk": h, "tile_k": tk, "head_loop": lp} for h, tk, lp in cands
    ]
    tuner = AutoTuner.get()
    sel = tuner.cached(op_key, tactics)
    if sel is None and tuner.enabled and not isinstance(
        ctx["q_packed"], jax.core.Tracer
    ):

        class _Runner(TunableRunner):
            def get_valid_tactics(self):
                return tactics

            def run(self, tactic, *args):
                return _execute_tiles(
                    tactic["h_blk"], tactic["tile_k"],
                    tactic.get("head_loop", False), **ctx
                )

        from flashinfer_tpu.testing.utils import bench_tpu_time_differential

        def time_tactic(tactic):
            # big arrays ride as scan invariants (never closure-captured:
            # they would become HLO constants) and a tiny-but-nonzero
            # reduction of the output chains the carry so iterations
            # serialize and nothing is DCE'd
            def step(carry, kc, vc, ki, wm, pa):
                o, _ = _execute_tiles(
                    tactic["h_blk"], tactic["tile_k"],
                    tactic.get("head_loop", False),
                    **{**ctx, "q_packed": carry, "k_cache": kc,
                       "v_cache": vc, "kv_indices": ki, "work_mask": wm,
                       "plan_arrays": pa},
                )
                dep = jnp.sum(o.astype(jnp.float32)) * 1e-30
                return carry + dep.astype(carry.dtype)

            return bench_tpu_time_differential(
                step, ctx["q_packed"], ctx["k_cache"], ctx["v_cache"],
                ctx["kv_indices"], ctx["work_mask"], ctx["plan_arrays"],
                n_short=2, n_long=26, repeats=6,
            )

        sel = tuner.choose_one(op_key, _Runner(), time_tactic=time_tactic)
    if sel is not None:
        return sel["h_blk"], sel["tile_k"], sel.get("head_loop", False)
    return cands[0]



def _finish_run(
    q_packed, k_cache, v_cache, kv_indices, plan_arrays, *,
    plan_meta, causal, sm_scale, v_scale, kv_dequant, window_left, tile_k,
    nsub, page_size, head_offset, h_blk, variant, variant_params, kv_layout,
    ragged, interpret, d_pad, dv_pad, work_mask=None, head_loop=False,
):
    tile_q = plan_meta.tile_q
    group = plan_meta.gqa_group
    T = plan_meta.num_work_items
    num_kv_heads = h_blk

    v_arrays, v_specs, rebuild = _variant_plumbing(variant_params)

    grid = (T, nsub)

    def q_index(w, j, *s):
        return (0, s[0][_QO_START * T + w] // tile_q, 0)

    in_specs = [
        pl.BlockSpec((num_kv_heads, tile_q, d_pad), q_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # k_cache stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # v_cache stays in HBM
        *(
            [pl.BlockSpec((1, tile_q, tile_k), lambda w, j, *s: (w, 0, j),
                          memory_space=pltpu.VMEM)]
            if work_mask is not None else []
        ),
        *v_specs,
    ]

    kernel = functools.partial(
        _paged_kernel,
        num_variant_leaves=len(v_arrays),
        rebuild_params=rebuild,
        has_mask=work_mask is not None,
        variant=variant,
        sm_scale=sm_scale,
        v_scale=v_scale,
        kv_dequant=kv_dequant,
        window_left=window_left,
        causal=causal,
        group=group,
        tile_q=tile_q,
        tile_k=tile_k,
        page_size=page_size,
        nsub=nsub,
        num_kv_heads=num_kv_heads,
        head_offset=head_offset,
        layout=kv_layout,
        num_items=T,
        ragged=ragged,
        kv_major=plan_meta.kv_major,
        head_loop=head_loop,
        probe=os.environ.get("FLASHINFER_TPU_KERNEL_PROBE") or None,
    )

    if ragged or kv_layout == TensorLayout.NHD:
        k_scratch = pltpu.VMEM((2, tile_k, num_kv_heads, d_pad), k_cache.dtype)
        v_scratch = pltpu.VMEM((2, tile_k, num_kv_heads, dv_pad), v_cache.dtype)
    else:
        k_scratch = pltpu.VMEM((2, num_kv_heads, tile_k, d_pad), k_cache.dtype)
        v_scratch = pltpu.VMEM((2, num_kv_heads, tile_k, dv_pad), v_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # flat [12*T] plan + kv_indices
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, num_kv_heads, tile_q, dv_pad), lambda w, j, *s: (w, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, num_kv_heads, tile_q), lambda w, j, *s: (w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            k_scratch,
            v_scratch,
            pltpu.SemaphoreType.DMA((2, max(tile_k // page_size, 1))),
            pltpu.SemaphoreType.DMA((2, max(tile_k // page_size, 1))),
            pltpu.VMEM((num_kv_heads, tile_q, dv_pad), jnp.float32),
            pltpu.VMEM((num_kv_heads, tile_q, _LANES), jnp.float32),
            pltpu.VMEM((num_kv_heads, tile_q, _LANES), jnp.float32),
        ],
    )

    kv_bytes = (
        plan_meta.kv_chunk_size * T * (d_pad + dv_pad) * k_cache.dtype.itemsize
        * num_kv_heads
    )
    partial_o, partial_lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, num_kv_heads, tile_q, dv_pad), q_packed.dtype),
            jax.ShapeDtypeStruct((T, num_kv_heads, tile_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # head_loop tiles are chosen under the wide VMEM budget; raise
            # Mosaic's scoped-vmem cap accordingly (sampler precedent)
            **(
                {"vmem_limit_bytes": _VMEM_LIMIT_WIDE} if head_loop else {}
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * tile_q * plan_meta.kv_chunk_size * (d_pad + dv_pad) // 2
            * num_kv_heads,
            bytes_accessed=kv_bytes,
            transcendentals=T * tile_q * plan_meta.kv_chunk_size * num_kv_heads,
        ),
        interpret=interpret,
    )(plan_arrays.reshape(-1), kv_indices, q_packed, k_cache, v_cache,
      *([] if work_mask is None else [work_mask]), *v_arrays)

    return partial_o, partial_lse
