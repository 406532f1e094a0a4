"""Batch attention wrappers — the public plan/run API.

Reference parity:
  * ``BatchAttention``                      (flashinfer/attention.py:42)
  * ``BatchPrefillWithPagedKVCacheWrapper`` (flashinfer/prefill.py:1226)
  * ``BatchPrefillWithRaggedKVCacheWrapper``(flashinfer/prefill.py:2255)
  * ``BatchDecodeWithPagedKVCacheWrapper``  (flashinfer/decode.py:581)
  * ``BatchAttentionWithAttentionSinkWrapper`` (flashinfer/attention.py:201)

Architecture (TPU-first, see SURVEY.md §7): ``plan()`` runs on the host
(NumPy), turning the batch's indptrs into padded, static-shape work
descriptors plus gather maps (one small H2D upload — the analogue of the
reference's single pinned-memory copy, scheduler.cuh:790). ``run()`` is pure
traced JAX: gather q into the GQA-packed padded layout → Pallas paged/ragged
kernel → segment softmax-merge of split-KV partials → scatter back. Because
every shape in run() is a pure function of the plan's *bucketed* sizes, XLA
compiles one program per bucket and replays it — the role CUDA graphs play
in the reference.

The reference's workspace buffers (float_workspace_buffer etc.) do not exist
here: XLA owns scratch allocation. ``plan()`` accepts and ignores
workspace-like kwargs for drop-in familiarity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.attention.kernels.paged import batch_paged_attention_run
from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.attention.state import gather_merge_states
from flashinfer_tpu.ops.attention.variants import (
    AttentionVariant,
    make_default_variant,
)
from flashinfer_tpu.scheduler.plan import (
    AttentionPlan,
    build_merge_src,
    plan_attention,
)
from flashinfer_tpu.utils import (
    TensorLayout,
    check_kv_layout,
    next_power_of_2,
    on_tpu,
    round_up,
)

__all__ = [
    "BatchAttention",
    "BatchPrefillWithPagedKVCacheWrapper",
    "BatchPrefillWithRaggedKVCacheWrapper",
    "BatchDecodeWithPagedKVCacheWrapper",
    "BatchAttentionWithAttentionSinkWrapper",
    "DevicePlan",
    "PlanMeta",
    "run_device_plan",
]


def _bucket(n: int, minimum: int = 1) -> int:
    return max(minimum, next_power_of_2(n))


def _unpack_request_masks(packed, dense, mask_indptr, qo_lens, kv_lens):
    """Per-request [qo_len, kv_len] bool masks from the reference's
    custom_mask (dense concat) or packed_custom_mask (packbits, 'big'
    bitorder — ops/quantization.packbits / flashinfer quantization.py:57).
    mask_indptr holds per-request BIT offsets; derived from lens if None."""
    if packed is not None:
        bits = np.unpackbits(np.asarray(packed, np.uint8))
    else:
        bits = np.asarray(dense).astype(np.uint8).ravel()
    sizes = (np.asarray(qo_lens, np.int64) * np.asarray(kv_lens, np.int64))
    if mask_indptr is None:
        mask_indptr = np.concatenate([[0], np.cumsum(sizes)])
    mask_indptr = np.asarray(mask_indptr, np.int64)
    masks = []
    for r in range(len(sizes)):
        qo, kv = int(qo_lens[r]), int(kv_lens[r])
        s = int(mask_indptr[r])
        masks.append(bits[s : s + qo * kv].reshape(qo, kv).astype(bool))
    return masks


def _multi_item_masks(qo_lens, kv_lens, prefix_len, tpos, L):
    """Multi-item scoring masks (reference prefill.cuh:795
    logits_mask_multi_item_scoring): a query token in the item region
    attends to the shared prefix plus its own item only; prefix queries see
    everything (under the kernel's causal bound). tpos[p - prefix] is the
    token's position within its item (0 = delimiter)."""
    masks = []
    tpos = np.asarray(tpos, np.int64).ravel()
    for r in range(len(qo_lens)):
        qo, kv = int(qo_lens[r]), int(kv_lens[r])
        pre = int(prefix_len[r])
        t = tpos[r * L : (r + 1) * L]
        p = kv - qo + np.arange(qo)  # query tokens sit at the sequence tail
        rel = np.clip(p - pre, 0, max(len(t) - 1, 0))
        item_start = p - (t[rel] if len(t) else 0)
        kvi = np.arange(kv)[None, :]
        keep = np.where(
            (p < pre)[:, None],
            True,
            (kvi < pre) | (kvi > item_start[:, None]),
        )
        masks.append(keep)
    return masks


def _build_work_mask(plan, req_masks, group):
    """Legalize per-request masks into the kernel's work-item tiling:
    uint8 [T, tile_q, kv_chunk_size], rows = GQA-packed q rows, cols =
    absolute kv offsets of the item's chunk. Out-of-range rows/cols are
    clipped — the kernel's base validity mask already excludes them."""
    T, tq, chunk = plan.num_work_items, plan.tile_q, plan.kv_chunk_size
    wm = np.ones((T, tq, chunk), np.uint8)
    for w in range(T):
        r = int(plan.request_indices[w])
        if r < 0 or req_masks[r] is None:
            continue
        m = req_masks[r]
        toks = (plan.qo_tile_indices[w] * tq + np.arange(tq)) // group
        toks = np.clip(toks, 0, m.shape[0] - 1)
        cols = np.clip(
            plan.kv_start[w] + np.arange(chunk), 0, m.shape[1] - 1
        )
        wm[w] = m[np.ix_(toks, cols)]
    return wm


@dataclasses.dataclass(frozen=True)
class PlanMeta:
    """Static (hashable) half of a device plan — the jit cache key. Every
    field is a pure function of the plan's *buckets*, so one compiled program
    serves all batches landing in the same buckets (the XLA analogue of the
    reference's CUDA-graph-stable plan, scheduler.cuh:694)."""

    tile_q: int
    kv_chunk_size: int
    num_work_items: int
    page_size: int
    gqa_group: int
    bucket_rows: int
    nnz: int
    num_qo_heads: int
    num_kv_heads: int
    head_dim_qk: int
    head_dim_vo: int
    causal: bool
    sm_scale: float
    window_left: int
    ragged: bool
    kv_indices_len: int = 0
    max_splits: int = 1
    kv_major: bool = False
    has_mask: bool = False  # per-work-item custom/multi-item mask attached

    def blob_layout(self):
        """(name, length, shape) segments of the consolidated int32 blob."""
        T, tq = self.num_work_items, self.tile_q
        rows = self.bucket_rows
        segs = [("plan", 12 * T, (12, T))]
        segs.append(("kv_indices", self.kv_indices_len, (self.kv_indices_len,)))
        segs.append(("row_src", rows, (rows,)))
        segs.append(("row_valid", rows, (rows,)))
        segs.append(("merge_out_row", T * tq, (T * tq,)))
        segs.append(("out_map", self.nnz * self.gqa_group,
                     (self.nnz * self.gqa_group,)))
        segs.append(("merge_src", rows * self.max_splits,
                     (rows, self.max_splits)))
        return segs


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DevicePlan:
    """Dynamic half of a plan, registered as a pytree so a jitted serving
    step can take the whole plan as an argument — new plan, same buckets =>
    no retrace.

    All index arrays live in ONE consolidated int32 blob: plans are rebuilt
    every scheduling step and per-array device_put latency dominates on
    remote/tunneled devices (measured ~14 ms/step for 24 uploads); one
    upload + in-jit slicing is ~free. Accessors slice lazily."""

    blob: jax.Array  # [total] int32
    meta: PlanMeta
    # optional [T, tile_q, kv_chunk_size] uint8 keep-mask (custom masks /
    # multi-item scoring), built work-item-aligned at plan time so the
    # kernel DMAs exactly its tile's bytes
    work_mask: Optional[jax.Array] = None

    def tree_flatten(self):
        return (self.blob, self.work_mask), self.meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        return cls(children[0], meta=meta, work_mask=children[1])

    @classmethod
    def build(cls, meta: PlanMeta, arrays: dict,
              upload: bool = True) -> "DevicePlan":
        """Assemble from host NumPy arrays (single H2D upload).

        arrays keys: plan (tuple of 12 [T]), kv_indices, row_src,
        row_valid (bool), merge_out_row, out_map, merge_src,
        optionally work_mask (uint8 [T, tile_q, kv_chunk_size]).

        upload=False keeps the blob a host NumPy array — for callers that
        stack several same-meta plans into one [N, total] upload (the
        engine's multi-step decode window)."""
        parts = [np.asarray(a, np.int32).ravel() for a in arrays["plan"]]
        for name, _, _ in meta.blob_layout()[1:]:
            parts.append(np.asarray(arrays[name], np.int32).ravel())
        blob = np.concatenate(parts) if parts else np.zeros(0, np.int32)
        wm = arrays.get("work_mask")
        if not upload:
            return cls(
                blob, meta=meta,
                work_mask=None if wm is None else np.asarray(wm, np.int8),
            )
        return cls(
            jnp.asarray(blob), meta=meta,
            work_mask=None if wm is None else jnp.asarray(wm, jnp.int8),
        )

    def _seg(self, name):
        off = 0
        for seg_name, length, shape in self.meta.blob_layout():
            if seg_name == name:
                return jax.lax.dynamic_slice_in_dim(
                    self.blob, off, length
                ).reshape(shape)
            off += length
        raise KeyError(name)

    @property
    def plan_arrays(self) -> jax.Array:
        """ONE [12, num_work_items] int32 matrix (a single scalar-prefetch
        operand: each extra operand costs ~tens of us of kernel prologue —
        13 separate arrays measured ~0.1 ms/call, the entire kernel time
        at decode shapes)."""
        return self._seg("plan")

    @property
    def kv_indices(self):
        return self._seg("kv_indices")

    @property
    def row_src(self):
        return self._seg("row_src")

    @property
    def row_valid(self):
        return self._seg("row_valid") != 0

    @property
    def merge_out_row(self):
        return self._seg("merge_out_row")

    @property
    def out_map(self):
        return self._seg("out_map")

    @property
    def merge_src(self):
        return self._seg("merge_src")


def run_device_plan(
    dplan: DevicePlan,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    tile_k: int = 512,
    variant: AttentionVariant = None,
    variant_params: Any = None,
    kv_layout: TensorLayout = TensorLayout.HND,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    kv_indices_offset: int = 0,
    return_lse: bool = False,
    kv_dtype: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Functional run stage: execute a DevicePlan. Fully traceable — every
    input is a jit argument; statics live in dplan.meta. This is what
    serving engines jit (wrapper.run delegates here).

    kv_indices_offset: added to every page id — lets engines stack all
    layers' pages in ONE cache array ([L*pages, ...]) and pass it unsliced
    (slicing a donated cache per layer forces XLA to materialize copies)."""
    m = dplan.meta
    if variant is None:
        variant = make_default_variant()
    group = m.num_qo_heads // m.num_kv_heads
    nnz, hq, d = q.shape

    plan_meta = AttentionPlan(
        tile_q=m.tile_q,
        kv_chunk_size=m.kv_chunk_size,
        num_work_items=m.num_work_items,
        total_rows=0,
        batch_size=0,
        page_size=m.page_size,
        request_indices=None,
        qo_tile_indices=None,
        kv_tile_indices=None,
        qo_start_row=None,
        qo_tile_len=None,
        kv_start=None,
        kv_end=None,
        kv_page_start=None,
        num_kv_splits=None,
        q_pos_base=None,
        gqa_group=m.gqa_group,
        merge_out_row=None,
        num_valid_items=0,
        kv_major=m.kv_major,
    )

    q_r = (
        q.reshape(nnz, m.num_kv_heads, group, d)
        .transpose(1, 0, 2, 3)
        .reshape(m.num_kv_heads, nnz * group, d)
    )
    packed = jnp.take(q_r, dplan.row_src, axis=1)
    packed = jnp.where(dplan.row_valid[None, :, None], packed, 0)

    if m.ragged:
        pad = tile_k
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))

    # fp8 KV-cache: the kernel wants the bits in an int8 container (pre-v6
    # TPUs have no hw fp8 — see ops/fp8.py). Prefer storing the cache as
    # int8 + kv_dtype="e4m3" end-to-end (the serving engine does): a
    # float8-dtype cache costs a full bitcast COPY of the cache per call,
    # which XLA cannot hoist across in-place cache updates.
    kv_dequant = None
    if k.dtype == jnp.float8_e4m3fn:
        k = jax.lax.bitcast_convert_type(k, jnp.int8)
        v = jax.lax.bitcast_convert_type(v, jnp.int8)
        kv_dequant = "e4m3"
    elif k.dtype == jnp.int8:
        kv_dequant = "e4m3" if kv_dtype == "e4m3" else "int8"

    kv_idx = dplan.kv_indices
    # kv_indices_offset may be a TRACED value: serving engines lax.scan over
    # the layer axis and pass layer*num_pages as a per-iteration offset
    if not (isinstance(kv_indices_offset, int) and kv_indices_offset == 0):
        kv_idx = kv_idx + kv_indices_offset

    partial_o, partial_lse = batch_paged_attention_run(
        packed,
        k,
        v,
        kv_idx,
        dplan.plan_arrays,
        plan_meta=plan_meta,
        causal=m.causal,
        sm_scale=m.sm_scale,
        k_scale=k_scale,
        v_scale=v_scale,
        kv_dequant=kv_dequant,
        window_left=m.window_left,
        tile_k=tile_k,
        variant=variant,
        variant_params=variant_params,
        kv_layout=kv_layout,
        ragged=m.ragged,
        work_mask=dplan.work_mask,
        interpret=interpret,
    )
    kvh, dv = partial_o.shape[1], partial_o.shape[3]
    if m.max_splits == 1:
        # no split-KV: the merge is a pure permutation, so compose the
        # merge-src and output gathers into ONE gather straight from the
        # partials (skips a full read+write of the merged intermediate and
        # the softmax-combine math — a large share of prefill glue)
        comb = jnp.maximum(dplan.merge_src[:, 0][dplan.out_map], 0)
        w_idx, j_idx = comb // m.tile_q, comb % m.tile_q
        out = partial_o[w_idx, :, j_idx, :]  # [nnz*group, kvh, dv]
        out = (
            out.reshape(nnz, group, kvh, dv)
            .transpose(0, 2, 1, 3)
            .reshape(nnz, hq, dv)[:, :, : m.head_dim_vo]
        )
        if return_lse:
            lse = partial_lse[w_idx, :, j_idx]
            lse = (
                lse.reshape(nnz, group, kvh).transpose(0, 2, 1)
                .reshape(nnz, hq)
            )
            return out, lse
        return out

    merged_v, merged_s = gather_merge_states(
        partial_o, partial_lse, dplan.merge_src, m.tile_q
    )
    out = jnp.take(merged_v, dplan.out_map, axis=0)
    out = (
        out.reshape(nnz, group, kvh, dv)
        .transpose(0, 2, 1, 3)
        .reshape(nnz, hq, dv)[:, :, : m.head_dim_vo]
    )
    if return_lse:
        lse = jnp.take(merged_s, dplan.out_map, axis=0)
        lse = lse.reshape(nnz, group, kvh).transpose(0, 2, 1).reshape(nnz, hq)
        return out, lse
    return out


@dataclasses.dataclass
class PlanState:
    plan: AttentionPlan
    device_plan: DevicePlan
    # host copies for the reference fallback
    host: dict = dataclasses.field(default_factory=dict)

    def __getattr__(self, name):
        # passthrough: dynamic arrays live on device_plan, statics on meta
        dp = object.__getattribute__(self, "device_plan")
        if hasattr(dp, name):
            return getattr(dp, name)
        return getattr(dp.meta, name)


class BatchAttention:
    """Unified variable-length paged attention with plan/run split
    (reference flashinfer/attention.py:42 BatchAttention; its holistic
    two-stage scheduler maps to scheduler/plan.py)."""

    def __init__(
        self,
        kv_layout: str = "HND",
        *,
        backend: str = "auto",
        tile_q: Optional[int] = None,
        tile_k: int = 512,
        variant: Optional[AttentionVariant] = None,
    ):
        self._layout = check_kv_layout(kv_layout)
        self._backend = backend
        self._tile_q = tile_q
        self._tile_k = tile_k
        self._variant = variant
        self._variant_params = None
        self._state: Optional[PlanState] = None
        self._ragged = False

    # -- plan ---------------------------------------------------------------

    def plan(
        self,
        qo_indptr,
        kv_indptr,
        kv_indices,
        kv_last_page_len,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim_qk: int,
        page_size: int,
        *,
        head_dim_vo: Optional[int] = None,
        causal: bool = False,
        sm_scale: Optional[float] = None,
        window_left: int = -1,
        logits_soft_cap: float = 0.0,
        kv_chunk_size: Optional[int] = None,
        kv_len_arr=None,
        variant_params: Any = None,
        work_capacity: Optional[int] = None,
        min_bucket_rows: int = 0,  # floor for the padded-row bucket (SPMD
        # serving: every dp replica must produce an identical PlanMeta)
        min_max_splits: int = 1,  # floor for merge_src's split dimension
        force_kv_major: Optional[bool] = None,  # pin the kv-major reorder
        # flag (it otherwise flips with the prefill/decode mix, changing
        # PlanMeta — SPMD replicas must agree)
        custom_mask=None,  # dense bool, concat of per-request [qo_i, kv_i]
        packed_custom_mask=None,  # uint8 packbits of the above
        mask_indptr=None,  # [b+1] BIT offsets per request
        prefix_len_ptr=None,  # multi-item scoring (prefill.py ~1634)
        token_pos_in_items_ptr=None,
        token_pos_in_items_len: int = 0,
        max_item_len_ptr=None,  # accepted for parity; perf hint only
        defer_upload: bool = False,  # keep the plan blob on host (callers
        # that stack several same-meta plans into one upload)
        **_ignored,  # workspace buffers etc. accepted for API familiarity
    ):
        """Host-side plan; see module docstring. All indptr/indices args are
        host arrays (NumPy or small device arrays — they are pulled to host,
        mirroring the reference's D2H sync at plan time, prefill.py:1717)."""
        qo_indptr = np.asarray(qo_indptr, np.int64)
        kv_indptr = np.asarray(kv_indptr, np.int64)
        kv_indices_np = np.asarray(kv_indices, np.int64)
        batch = len(qo_indptr) - 1
        head_dim_vo = head_dim_vo or head_dim_qk
        if sm_scale is None:
            sm_scale = 1.0 / math.sqrt(head_dim_qk)
        assert num_qo_heads % num_kv_heads == 0
        group = num_qo_heads // num_kv_heads

        if kv_len_arr is not None:
            kv_lens = np.asarray(kv_len_arr, np.int64)
        elif self._ragged:
            kv_lens = kv_indptr[1:] - kv_indptr[:-1]
        else:
            last = np.asarray(kv_last_page_len, np.int64)
            npages = kv_indptr[1:] - kv_indptr[:-1]
            kv_lens = np.where(npages > 0, (npages - 1) * page_size + last, 0)

        # Tiny pages (page_size < 8, the vector-sparse regime): sub-sublane
        # page DMAs land at unaligned VMEM offsets and Mosaic rejects them
        # on hardware (and 1-token DMAs could never reach bandwidth anyway).
        # TPU-right treatment: ONE XLA gather repacks the scattered tokens
        # into a synthetic HND page_size=128 cache at run() time (the
        # ragged wrapper's strategy — batch.py _RAGGED_PAGE), and the plan
        # below is built directly on the synthetic page table. One extra KV
        # read+write; the reference's vector-sparse headline (~90% of dense
        # bandwidth, README.md:24) is matched by riding the dense kernel.
        self._tiny_repack = (not self._ragged) and page_size < 8
        if self._tiny_repack:
            orig_host = dict(kv_indptr=kv_indptr, kv_indices=kv_indices_np)
            SP = 128
            toks = kv_lens
            syn_pages = -(-np.maximum(toks, 0) // SP)
            syn_indptr = np.concatenate([[0], np.cumsum(syn_pages)])
            n_syn = int(syn_indptr[-1])
            r_of_page = np.repeat(np.arange(batch), syn_pages)
            page_in_req = np.arange(n_syn) - syn_indptr[r_of_page]
            t = page_in_req[:, None] * SP + np.arange(SP)[None, :]  # in-req
            valid = t < toks[r_of_page][:, None]
            t_c = np.minimum(t, np.maximum(toks[r_of_page][:, None] - 1, 0))
            flat = kv_indptr[r_of_page][:, None] + t_c // page_size
            self._tiny_tok_page = jnp.asarray(
                kv_indices_np[np.minimum(flat, len(kv_indices_np) - 1)]
                .astype(np.int32))
            self._tiny_tok_slot = jnp.asarray((t_c % page_size).astype(
                np.int32))
            self._tiny_valid = jnp.asarray(valid)
            # the plan below sees only the synthetic table
            kv_indptr = syn_indptr.astype(np.int64)
            kv_indices_np = np.arange(max(n_syn, 1), dtype=np.int64)
            kv_last_page_len = np.where(toks > 0, ((toks - 1) % SP) + 1, 0)
            page_size = SP

        qo_lens = qo_indptr[1:] - qo_indptr[:-1]
        qo_token_total = int(qo_indptr[-1])

        # tile_q: decode-ish batches get a group-sized tile; prefill rows get
        # large tiles (fewer grid steps + fewer KV-resident passes — measured
        # ~1.3x over 128 at 1k context)
        avg_packed = max(1, int((qo_lens * group).mean())) if batch else 1
        tile_q = self._tile_q or min(512, max(8, next_power_of_2(avg_packed)))
        tile_q = max(tile_q, next_power_of_2(group), 8)

        packed_lens = qo_lens * group
        padded_lens = np.maximum(round_up_np(packed_lens, tile_q), 0)
        padded_indptr = np.concatenate([[0], np.cumsum(padded_lens)])
        total_padded = int(padded_indptr[-1])
        bucket_rows = max(_bucket(max(total_padded, tile_q)), min_bucket_rows)

        # Prefill batches (multiple qo tiles per request) run the kv-major
        # order: KV chunk == kernel tile, items sorted so consecutive items
        # share a KV tile, DMA-dedup keeps it VMEM-resident (reads KV once
        # per request instead of once per qo tile).
        prefill_mode = (
            force_kv_major if force_kv_major is not None
            else bool(np.any(packed_lens > tile_q))
        )
        chunk = kv_chunk_size
        if prefill_mode and kv_chunk_size is None:
            # resident KV tile sized by the kernel's own VMEM budget: the
            # chunk equals the tile (nsub==1), enabling kv-major DMA dedup —
            # KV is read once per request instead of once per qo tile
            from flashinfer_tpu.ops.attention.kernels.paged import (
                tile_candidates,
            )

            eff_page = 1 if self._ragged else page_size
            d_pad = round_up(head_dim_qk, 128)
            dv_pad = round_up(head_dim_vo, 128)
            want = max(round_up(max(self._tile_k, 2048), eff_page), eff_page)
            # chunk = LARGEST VMEM-legal tile: every halving of the chunk
            # doubles split-KV partial traffic (written + merge-gathered),
            # which dominates prefill glue; the run stage may still pick a
            # smaller tile_k (nsub > 1) for its own call-count tradeoff
            sliceable = (
                not self._ragged and self._layout == TensorLayout.HND
            )
            cand_kw = dict(
                num_kv_heads=num_kv_heads,
                tile_q=tile_q,
                d_pad=d_pad,
                dv_pad=dv_pad,
                kv_itemsize=2,  # bf16/fp8-container caches
                q_itemsize=2,
                page_size=eff_page,
                kv_chunk_size=want,
                head_sliceable=sliceable,
                ragged=self._ragged,
            )
            cands_c = tile_candidates(**cand_kw)
            if sliceable and tile_q >= 256 and num_kv_heads > 1:
                # the run stage may pick the fori_loop-over-heads body,
                # whose VMEM model admits larger resident tiles
                cands_c = cands_c + tile_candidates(
                    **cand_kw, head_loop=True
                )
            chunk = max(tk for _, tk in cands_c)
        plan = plan_attention(
            padded_indptr,
            kv_lens,
            qo_token_lens=qo_lens,
            gqa_group=group,
            kv_indptr=None if self._ragged else kv_indptr,
            page_size=1 if self._ragged else page_size,
            tile_q=tile_q,
            kv_chunk_size=chunk,
            work_capacity=work_capacity,
            causal=causal,
        )
        if prefill_mode:
            from flashinfer_tpu.scheduler.plan import kv_major_order

            plan = kv_major_order(plan)
        if self._ragged:
            # rebase kv_page_start to global token offsets
            req = plan.request_indices
            base = np.where(req >= 0, kv_indptr[np.maximum(req, 0)], 0)
            plan = dataclasses.replace(
                plan, kv_page_start=(plan.kv_page_start + base).astype(np.int32)
            )

        # --- gather maps (host) ---
        rows = np.arange(bucket_rows)
        req_of_row = np.clip(
            np.searchsorted(padded_indptr, rows, side="right") - 1, 0, batch - 1
        )
        local = rows - padded_indptr[req_of_row]
        valid_row = (local < packed_lens[req_of_row]) & (rows < total_padded)
        token = qo_indptr[req_of_row] + local // group
        g = local % group
        row_src = np.where(valid_row, token * group + g, 0).astype(np.int32)

        # (token, g) -> padded row
        tg = np.arange(qo_token_total * group)
        tok = tg // group
        gg = tg % group
        req_of_tok = np.clip(
            np.searchsorted(qo_indptr, tok, side="right") - 1, 0, batch - 1
        )
        out_map = (
            padded_indptr[req_of_tok]
            + (tok - qo_indptr[req_of_tok]) * group
            + gg
        ).astype(np.int32)

        # merge map padded to T*tile_q already; destination rows are padded
        merge_out_row = plan.merge_out_row

        # page table: pad to bucket (rides the consolidated plan blob)
        if self._ragged:
            kv_idx_host = np.zeros(1, np.int32)
        else:
            cap = _bucket(max(len(kv_indices_np), 1))
            kv_idx_host = np.zeros(cap, np.int32)
            kv_idx_host[: len(kv_indices_np)] = kv_indices_np

        # --- per-request custom masks / multi-item scoring (host) ---
        # Reference: prefill.py:1523 custom_mask/packed_custom_mask ->
        # mask_mode CUSTOM; prefill.py:~1634 multi-item scoring ->
        # mask_mode 3. TPU design: masks are static per plan, so they are
        # legalized ONCE here into a work-item-aligned byte array the
        # kernel DMAs tile-wise (1 byte/element only for masked plans) —
        # recomputing per-element mask logic on the VPU every run would
        # cost more than the DMA on the bandwidth-bound TPU kernel.
        req_masks = None
        if packed_custom_mask is not None or custom_mask is not None:
            assert prefix_len_ptr is None, (
                "custom_mask and multi-item scoring are mutually exclusive"
            )
            req_masks = _unpack_request_masks(
                packed_custom_mask, custom_mask, mask_indptr, qo_lens,
                kv_lens,
            )
        elif prefix_len_ptr is not None:
            assert causal, "multi-item scoring implies causal masking"
            req_masks = _multi_item_masks(
                qo_lens, kv_lens,
                np.asarray(prefix_len_ptr, np.int64),
                np.asarray(token_pos_in_items_ptr, np.int64),
                int(token_pos_in_items_len)
                or len(np.asarray(token_pos_in_items_ptr).ravel()),
            )
        work_mask = (
            None if req_masks is None
            else _build_work_mask(plan, req_masks, group)
        )

        variant = self._variant or make_default_variant(
            logits_soft_cap=logits_soft_cap
        )
        self._variant_resolved = variant
        self._variant_params = variant_params

        merge_src = build_merge_src(merge_out_row, bucket_rows,
                                    min_splits=min_max_splits)
        meta = PlanMeta(
            tile_q=plan.tile_q,
            kv_chunk_size=plan.kv_chunk_size,
            num_work_items=plan.num_work_items,
            page_size=page_size,
            gqa_group=plan.gqa_group,
            bucket_rows=bucket_rows,
            nnz=qo_token_total,
            num_qo_heads=num_qo_heads,
            num_kv_heads=num_kv_heads,
            head_dim_qk=head_dim_qk,
            head_dim_vo=head_dim_vo,
            causal=causal,
            sm_scale=sm_scale,
            window_left=window_left,
            ragged=self._ragged,
            kv_indices_len=int(kv_idx_host.shape[0]),
            max_splits=int(merge_src.shape[1]),
            kv_major=plan.kv_major,
            has_mask=work_mask is not None,
        )
        device_plan = DevicePlan.build(
            meta,
            dict(
                plan=plan.prefetch_arrays(),
                kv_indices=kv_idx_host,
                row_src=row_src,
                row_valid=valid_row,
                merge_out_row=merge_out_row,
                out_map=out_map,
                merge_src=merge_src,
                work_mask=work_mask,
            ),
            upload=not defer_upload,
        )
        self._state = PlanState(
            plan=plan,
            device_plan=device_plan,
            host=dict(
                qo_indptr=qo_indptr,
                # reference path gathers from the ORIGINAL page table (the
                # tiny-page repack is a pallas-path concern)
                kv_indptr=(orig_host["kv_indptr"] if self._tiny_repack
                           else kv_indptr),
                kv_indices=(orig_host["kv_indices"] if self._tiny_repack
                            else kv_indices_np),
                kv_lens=kv_lens,
                req_masks=req_masks,
            ),
        )
        return self

    @property
    def device_plan(self) -> Optional[DevicePlan]:
        """The functional plan for jitted serving loops (see
        run_device_plan)."""
        return self._state.device_plan if self._state else None

    # -- run ----------------------------------------------------------------

    def _resolve_backend(self):
        if self._backend == "auto":
            return "pallas" if on_tpu() else "reference"
        return self._backend

    def run(
        self,
        q: jax.Array,
        kv_cache,
        *,
        k_scale: float = 1.0,
        v_scale: float = 1.0,
        return_lse: bool = False,
        interpret: Optional[bool] = None,
    ):
        """Execute the planned batch. q: [nnz_tokens, num_qo_heads, head_dim].
        kv_cache: paged cache ((k, v) or stacked; layout per wrapper) or, for
        ragged wrappers, (k, v) with [total_kv, num_kv_heads, head_dim].
        k_scale/v_scale: FP8 KV-cache dequant scales (reference
        prefill.py/decode.py run(..., k_scale, v_scale)); folded into the
        softmax scale / output — zero extra HBM traffic. Prefer page_size
        >= 32 for fp8 caches (fp8 VMEM sublane tile is 32)."""
        st = self._state
        assert st is not None, "call plan() before run()"
        backend = self._resolve_backend()
        if backend == "reference" and interpret is None:
            return self._run_reference(
                q, kv_cache, return_lse, k_scale=k_scale, v_scale=v_scale
            )
        return self._run_pallas(
            q, kv_cache, return_lse, interpret, k_scale=k_scale,
            v_scale=v_scale,
        )

    def _split_cache(self, kv_cache):
        st = self._state
        if st.ragged:
            k, v = kv_cache
            return k, v
        if self._layout == TensorLayout.HND:
            if isinstance(kv_cache, (tuple, list)):
                k, v = kv_cache
            else:
                k, v = kv_cache[:, 0], kv_cache[:, 1]
            return k, v  # already [pages, kvh, page_size, d]
        else:
            if isinstance(kv_cache, (tuple, list)):
                k, v = kv_cache
            else:
                k, v = kv_cache[:, 0], kv_cache[:, 1]
            return k, v  # [pages, page_size, kvh, d] (NHD path in kernel)

    def _tiny_page_repack(self, kv):
        """Gather a tiny-page (page_size < 8) cache into the synthetic HND
        page_size=128 cache the plan was built on (see plan())."""
        if self._layout == TensorLayout.HND:  # [P, kvh, ps, d]
            g = kv[self._tiny_tok_page, :, self._tiny_tok_slot]
        else:  # NHD [P, ps, kvh, d]
            g = kv[self._tiny_tok_page, self._tiny_tok_slot]
        g = jnp.where(self._tiny_valid[:, :, None, None], g, 0)
        return jnp.swapaxes(g, 1, 2)  # [n_syn, kvh, 128, d]

    def _run_pallas(self, q, kv_cache, return_lse, interpret,
                    k_scale=1.0, v_scale=1.0):
        st = self._state
        nnz = q.shape[0]
        assert nnz == st.nnz, f"q rows {nnz} != planned {st.nnz}"
        k, v = self._split_cache(kv_cache)
        layout = self._layout
        if getattr(self, "_tiny_repack", False):
            k, v = self._tiny_page_repack(k), self._tiny_page_repack(v)
            layout = TensorLayout.HND
        return run_device_plan(
            st.device_plan,
            q,
            k,
            v,
            tile_k=self._tile_k,
            variant=self._variant_resolved,
            variant_params=self._variant_params,
            kv_layout=layout,
            k_scale=k_scale,
            v_scale=v_scale,
            return_lse=return_lse,
            interpret=interpret,
        )

    def _run_reference(self, q, kv_cache, return_lse, k_scale=1.0,
                       v_scale=1.0):
        """Concrete-value oracle path (CPU default): gathers each request's
        KV from pages and calls the dense oracle. Not jittable; used for
        tests and non-TPU fallback."""
        if k_scale != 1.0 or v_scale != 1.0:
            k, v = self._split_cache(kv_cache) if not self._state.ragged \
                else kv_cache
            kv_cache = (
                (k.astype(jnp.float32) * k_scale).astype(q.dtype),
                (v.astype(jnp.float32) * v_scale).astype(q.dtype),
            )
        st = self._state
        h = st.host
        nnz, hq, d = q.shape
        outs, lses = [], []
        if st.ragged:
            k_all, v_all = kv_cache
        else:
            k_cache, v_cache = self._split_cache(kv_cache)
            if self._layout == TensorLayout.NHD:
                k_cache = jnp.swapaxes(k_cache, 1, 2)
                v_cache = jnp.swapaxes(v_cache, 1, 2)
            # now [pages, kvh, page_size, d]
        for r in range(len(h["qo_indptr"]) - 1):
            q_r = q[h["qo_indptr"][r] : h["qo_indptr"][r + 1]]
            kv_len = int(h["kv_lens"][r])
            if st.ragged:
                k_r = k_all[h["kv_indptr"][r] : h["kv_indptr"][r] + kv_len]
                v_r = v_all[h["kv_indptr"][r] : h["kv_indptr"][r] + kv_len]
            else:
                pages = h["kv_indices"][
                    h["kv_indptr"][r] : h["kv_indptr"][r + 1]
                ]
                k_r = (
                    k_cache[pages]
                    .transpose(0, 2, 1, 3)
                    .reshape(-1, st.num_kv_heads, k_cache.shape[-1])[:kv_len]
                )
                v_r = (
                    v_cache[pages]
                    .transpose(0, 2, 1, 3)
                    .reshape(-1, st.num_kv_heads, v_cache.shape[-1])[:kv_len]
                )
            req_masks = h.get("req_masks")
            o, lse = attention_reference(
                q_r,
                k_r,
                v_r,
                causal=st.causal,
                sm_scale=st.sm_scale,
                window_left=st.window_left,
                custom_mask=(
                    None if req_masks is None
                    else jnp.asarray(req_masks[r])
                ),
                variant=self._variant_resolved,
                variant_params=self._variant_params,
            )
            outs.append(o)
            lses.append(lse)
        out = jnp.concatenate(outs, 0) if outs else jnp.zeros((0, hq, d), q.dtype)
        if return_lse:
            lse = (
                jnp.concatenate(lses, 0)
                if lses
                else jnp.zeros((0, hq), jnp.float32)
            )
            return out, lse
        return out


def round_up_np(x, m):
    return ((x + m - 1) // m) * m


class BatchPrefillWithPagedKVCacheWrapper(BatchAttention):
    """Reference parity: flashinfer/prefill.py:1226 (plan :1523, run :1979)."""

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "HND", **kw):
        super().__init__(kv_layout=kv_layout, **kw)

    def plan(  # noqa: D102 - see BatchAttention.plan
        self,
        qo_indptr,
        paged_kv_indptr,
        paged_kv_indices,
        paged_kv_last_page_len,
        num_qo_heads,
        num_kv_heads,
        head_dim_qk,
        page_size,
        **kwargs,
    ):
        return super().plan(
            qo_indptr,
            paged_kv_indptr,
            paged_kv_indices,
            paged_kv_last_page_len,
            num_qo_heads,
            num_kv_heads,
            head_dim_qk,
            page_size,
            **kwargs,
        )


class BatchDecodeWithPagedKVCacheWrapper(BatchAttention):
    """Reference parity: flashinfer/decode.py:581 (plan :810, run :1163).
    Decode always uses the GQA-packed 'tensor-core' path (the reference's
    use_tensor_cores=True route, decode.py:1030)."""

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "HND", **kw):
        kw.setdefault("tile_q", None)
        super().__init__(kv_layout=kv_layout, **kw)

    def plan(
        self,
        indptr,
        indices,
        last_page_len,
        num_qo_heads,
        num_kv_heads,
        head_dim,
        page_size,
        **kwargs,
    ):
        batch = len(np.asarray(indptr)) - 1
        qo_indptr = np.arange(batch + 1)
        kwargs.setdefault("causal", False)
        return super().plan(
            qo_indptr,
            indptr,
            indices,
            last_page_len,
            num_qo_heads,
            num_kv_heads,
            head_dim,
            page_size,
            **kwargs,
        )


class BatchPrefillWithRaggedKVCacheWrapper(BatchAttention):
    """Reference parity: flashinfer/prefill.py:2255. KV is contiguous
    [total_kv, num_kv_heads, head_dim] addressed by a token indptr.

    TPU execution strategy: the contiguous layout keeps the head axis on the
    HBM sublane tiling, which blocks head-group slicing and forces tiny KV
    tiles for many-head models. run() therefore repacks KV into a synthetic
    HND paged cache (page_size 128, one gather pass — ~2x KV traffic, amortized
    over the O(seq) prefill FLOPs) and runs the optimized paged path.
    """

    _RAGGED_PAGE = 128

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "NHD", **kw):
        super().__init__(kv_layout="HND", **kw)
        self._kv_indptr_tok: Optional[np.ndarray] = None

    def plan(
        self,
        qo_indptr,
        kv_indptr,
        num_qo_heads,
        num_kv_heads,
        head_dim_qk,
        **kwargs,
    ):
        kv_indptr = np.asarray(kv_indptr, np.int64)
        kv_lens = kv_indptr[1:] - kv_indptr[:-1]
        ps = self._RAGGED_PAGE
        pages = -(-np.maximum(kv_lens, 0) // ps)
        page_indptr = np.concatenate([[0], np.cumsum(pages)])
        total_pages = int(page_indptr[-1])
        indices = np.arange(max(total_pages, 1), dtype=np.int64)
        last = np.where(kv_lens > 0, ((kv_lens - 1) % ps) + 1, 0)

        # host maps for the run()-time repack: page p covers tokens
        # kv_indptr[r] + page_in_req*ps + [0, ps)
        r_of_page = np.repeat(np.arange(len(kv_lens)), pages)
        page_in_req = np.arange(total_pages) - page_indptr[r_of_page]
        base = kv_indptr[r_of_page] + page_in_req * ps
        tok = base[:, None] + np.arange(ps)[None, :]
        limit = kv_indptr[r_of_page + 1][:, None]
        self._repack_valid = jnp.asarray(tok < limit)
        self._repack_tok = jnp.asarray(np.minimum(tok, limit - 1))
        self._kv_indptr_tok = kv_indptr

        return super().plan(
            qo_indptr,
            page_indptr,
            indices,
            last,
            num_qo_heads,
            num_kv_heads,
            head_dim_qk,
            page_size=ps,
            **kwargs,
        )

    def _repack(self, kv: jax.Array) -> jax.Array:
        """[total_kv, kvh, d] -> HND pages [n_pages, kvh, page_size, d]."""
        gathered = kv[self._repack_tok]  # [n_pages, ps, kvh, d]
        gathered = jnp.where(
            self._repack_valid[:, :, None, None], gathered, 0
        )
        return jnp.swapaxes(gathered, 1, 2)

    def run(self, q, k, v=None, **kwargs):
        if v is None:
            k, v = k  # allow run(q, (k, v))
        if self._resolve_backend() == "reference" and \
                kwargs.get("interpret") is None:
            return self._run_ragged_reference(q, k, v, **kwargs)
        return super().run(q, (self._repack(k), self._repack(v)), **kwargs)

    def _run_ragged_reference(self, q, k, v, *, return_lse=False, **kwargs):
        st = self._state
        h = st.host
        tok_indptr = self._kv_indptr_tok
        outs, lses = [], []
        for r in range(len(h["qo_indptr"]) - 1):
            q_r = q[h["qo_indptr"][r] : h["qo_indptr"][r + 1]]
            k_r = k[tok_indptr[r] : tok_indptr[r + 1]]
            v_r = v[tok_indptr[r] : tok_indptr[r + 1]]
            o, lse = attention_reference(
                q_r, k_r, v_r, causal=st.causal, sm_scale=st.sm_scale,
                window_left=st.window_left, variant=self._variant_resolved,
                variant_params=self._variant_params,
            )
            outs.append(o)
            lses.append(lse)
        out = jnp.concatenate(outs, 0) if outs else jnp.zeros_like(q)
        if return_lse:
            return out, jnp.concatenate(lses, 0)
        return out


class BatchAttentionWithAttentionSinkWrapper(BatchAttention):
    """GPT-OSS attention sinks (reference flashinfer/attention.py:201): an
    extra per-head logit joins the softmax denominator. Implemented as a
    variant whose sink rides the merge: the sink state is (v=0, s=sink),
    merged once per output row after the kernel."""

    def __init__(self, sink: jax.Array, kv_layout: str = "HND", **kw):
        super().__init__(kv_layout=kv_layout, **kw)
        self._sink = jnp.asarray(sink, jnp.float32)

    def run(self, q, kv_cache, *, return_lse: bool = False, **kwargs):
        out, lse = super().run(q, kv_cache, return_lse=True, **kwargs)
        # merge sink state: v=0, s=log(exp(sink)) = sink per head
        sink = jnp.broadcast_to(self._sink[None, :], lse.shape)
        from flashinfer_tpu.ops.attention.state import merge_state

        out_m, lse_m = merge_state(out, lse, jnp.zeros_like(out), sink)
        return (out_m, lse_m) if return_lse else out_m
