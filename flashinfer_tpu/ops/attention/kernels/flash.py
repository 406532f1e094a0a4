"""Dense flash-attention Pallas kernel (single request).

Reference parity: SinglePrefillWithKVCacheDispatched
(include/flashinfer/attention/prefill.cuh:1589) and
SingleDecodeWithKVCacheDispatched (decode.cuh:217). TPU-first design, not a
port: the CUDA kernel hand-schedules cp.async pipelines and warp-level MMA;
here the Mosaic pipeline does the double-buffering via BlockSpecs, the MXU
gets [TILE_Q, D] x [D, TILE_K] tiles, and online softmax state lives in VMEM
scratch carried across the sequential kv grid dimension.

Causal pruning: instead of launching fewer blocks (impossible with a static
grid), the K/V index maps clamp the kv tile index at the causal frontier so
pruned steps re-address the block already resident in VMEM — Pallas elides
the DMA — and ``@pl.when`` skips the compute. Cost of a pruned step ~ zero.

Variant hooks (BYOA) are traced into the kernel body: params leaves whose
leading dim == num_qo_heads are blocked per-head by the pipeline so hooks see
a single-head slice and index it with head_idx == 0; the same hook code runs
unmodified in the oracle with the full head dimension.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashinfer_tpu.ops.attention.variants import AttentionVariant, DefaultAttention
from flashinfer_tpu.utils import (
    cdiv,
    default_interpret,
    round_up,
    sublane_multiple,
)

__all__ = ["flash_attention_dense"]

_NEG_INF = float("-inf")
_LANES = 128


def _variant_param_plumbing(variant_params, num_qo_heads, head_of_grid, grid_ndim):
    """Flatten variant params into Pallas inputs.

    Returns (arrays, in_specs, rebuild) where rebuild(loaded_refs) -> params
    pytree as hooks expect. Per-head leaves (leading dim == num_qo_heads) are
    blocked to the current head; hooks must index them with head_idx (0 in
    kernel)."""
    if variant_params is None:
        return [], [], lambda loaded: None
    leaves, treedef = jax.tree_util.tree_flatten(variant_params)
    arrays, specs, metas = [], [], []
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == num_qo_heads:
            flat = leaf.reshape(num_qo_heads, -1)
            rest = leaf.shape[1:]
            block = (1, flat.shape[1])

            def imap(*gi, _hog=head_of_grid):
                return (_hog(*gi), 0)

            specs.append(pl.BlockSpec(block, imap, memory_space=pltpu.VMEM))
            metas.append(("head", rest))
            arrays.append(flat)
        else:
            flat = leaf.reshape(1, -1) if leaf.ndim < 2 else leaf
            specs.append(
                pl.BlockSpec(
                    flat.shape, lambda *gi: (0,) * flat.ndim, memory_space=pltpu.VMEM
                )
            )
            metas.append(("full", leaf.shape))
            arrays.append(flat)

    def rebuild(loaded):
        out = []
        for val, (kind, shape) in zip(loaded, metas):
            if kind == "head":
                out.append(val.reshape((1,) + tuple(shape)))
            else:
                out.append(val.reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    return arrays, specs, rebuild


def _flash_kernel(
    # refs (dynamic count: q, k, v, [custom_mask], [sink], *variant_leaves,
    #       out, lse, scratch: acc, m, l)
    *refs,
    num_variant_leaves: int,
    rebuild_params,
    has_mask: bool,
    has_sink: bool,
    causal: bool,
    sm_scale: float,
    window_left: int,
    kv_len: int,
    qo_len: int,
    tile_q: int,
    tile_k: int,
    variant: AttentionVariant,
    kv_tiles: int,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    mask_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1
    sink_ref = None
    if has_sink:
        sink_ref = refs[idx]; idx += 1
    variant_refs = refs[idx : idx + num_variant_leaves]
    idx += num_variant_leaves
    out_ref, lse_ref, acc_ref, m_ref, l_ref = refs[idx : idx + 5]

    h = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # causal frontier: q tile qi covers abs positions
    # [qi*tile_q + off, qi*tile_q + tile_q - 1 + off], off = kv_len - qo_len
    offset = kv_len - qo_len
    if causal:
        last_needed = jax.lax.div(qi * tile_q + tile_q - 1 + offset, tile_k)
        run = kj <= last_needed
    else:
        run = True
    # sliding window lower frontier: kv tiles entirely below the window of
    # every row in this q tile are skipped.
    if window_left >= 0:
        first_needed = jax.lax.div(
            jnp.maximum(qi * tile_q + offset - window_left, 0), tile_k
        )
        run = jnp.logical_and(run, kj >= first_needed)

    @pl.when(run)
    def _compute():
        q = q_ref[0]  # [tile_q, d]
        k = k_ref[0]  # [tile_k, d]
        v = v_ref[0]
        params = rebuild_params([r[:] for r in variant_refs])

        qf = q
        if variant.query_transform is not None:
            qf = variant.query_transform(params, qf.astype(jnp.float32))
        s = jax.lax.dot_general(
            qf,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale

        q_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 0)
            + qi * tile_q
            + offset
        )
        kv_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 1) + kj * tile_k
        )
        head_idx = jnp.zeros((1, 1), jnp.int32)

        if variant.logits_transform is not None:
            s = variant.logits_transform(params, s, q_pos, kv_pos, head_idx)

        mask = kv_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, kv_pos <= q_pos)
        if window_left >= 0:
            mask = jnp.logical_and(mask, kv_pos > q_pos - window_left - 1)
        if mask_ref is not None:
            mask = jnp.logical_and(mask, mask_ref[:] != 0)
        if variant.logits_mask is not None:
            mask = jnp.logical_and(
                mask, variant.logits_mask(params, q_pos, kv_pos, head_idx)
            )

        if variant.use_softmax:
            s = jnp.where(mask, s, _NEG_INF)
            m_prev = m_ref[:]  # [tile_q, LANES] replicated
            m_cur = jnp.max(s, axis=1, keepdims=True)  # [tile_q, 1]
            m_new = jnp.maximum(m_prev, m_cur)  # replicated via broadcast
            m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
            p = jnp.exp(s - m_safe[:, :1])
            p = jnp.where(mask, p, 0.0)
            alpha = jnp.where(
                jnp.isneginf(m_prev), 0.0, jnp.exp(m_prev - m_safe)
            )  # [tile_q, LANES]
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:] = m_new
            pv = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] * alpha[:, :1] + pv
        else:
            # non-softmax variants (e.g. sigmoid): plain weighted sum
            w = jnp.where(mask, s, 0.0)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                w.astype(v.dtype),
                v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kj == kv_tiles - 1)
    def _finalize():
        if variant.use_softmax:
            m = m_ref[:, :1]
            l = l_ref[:, :1]
            if has_sink:
                sink_val = sink_ref[0, 0]  # per-head block -> scalar
                m_fin = jnp.maximum(m, sink_val)
                m_fin_safe = jnp.where(jnp.isneginf(m_fin), 0.0, m_fin)
                l = l * jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_fin_safe))
                l = l + jnp.exp(sink_val - m_fin_safe)
                acc_scale = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_fin_safe))
                acc = acc_ref[:] * acc_scale
                m = m_fin
            else:
                acc = acc_ref[:]
            safe_l = jnp.where(l > 0, l, 1.0)
            out = acc / safe_l
            m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
            lse = jnp.where(l > 0, m_safe + jnp.log(safe_l), _NEG_INF)
            out_ref[0] = out.astype(out_ref.dtype)
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])
        else:
            out = acc_ref[:]
            if variant.output_transform is not None:
                params = rebuild_params([r[:] for r in variant_refs])
                out = variant.output_transform(params, out)
            out_ref[0] = out.astype(out_ref.dtype)
            lse_ref[0] = jnp.zeros(lse_ref.shape[1:], jnp.float32)


def flash_attention_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window_left: int = -1,
    custom_mask: Optional[jax.Array] = None,
    sink: Optional[jax.Array] = None,
    variant: AttentionVariant = DefaultAttention,
    variant_params: Any = None,
    tile_q: int = 128,
    tile_k: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dense single-request flash attention.

    Args:
      q: [qo_len, num_qo_heads, head_dim]
      k/v: [kv_len, num_kv_heads, head_dim(/head_dim_vo)]
      custom_mask: [qo_len, kv_len] bool (True = keep).
      sink: [num_qo_heads] f32 attention-sink logits.

    Returns (out [qo_len, heads, head_dim_vo], lse [qo_len, heads] f32).
    """
    if interpret is None:
        interpret = default_interpret()
    qo_len, num_qo_heads, head_dim = q.shape
    kv_len, num_kv_heads, _ = k.shape
    head_dim_vo = v.shape[-1]
    assert num_qo_heads % num_kv_heads == 0
    group = num_qo_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)

    tile_q = min(tile_q, round_up(qo_len, sublane_multiple(q.dtype)))
    tile_k = min(tile_k, round_up(kv_len, sublane_multiple(k.dtype)))
    qo_pad = round_up(qo_len, tile_q)
    kv_pad = round_up(kv_len, tile_k)
    d_pad = round_up(head_dim, _LANES)
    dv_pad = round_up(head_dim_vo, _LANES)

    # [h, seq, d] layout for clean 2D tiles per head
    def to_hsd(x, seq_pad, dp):
        x = jnp.swapaxes(x, 0, 1)
        return jnp.pad(
            x, ((0, 0), (0, seq_pad - x.shape[1]), (0, dp - x.shape[2]))
        )

    qh = to_hsd(q, qo_pad, d_pad)
    kh = to_hsd(k, kv_pad, d_pad)
    vh = to_hsd(v, kv_pad, dv_pad)

    q_tiles = qo_pad // tile_q
    kv_tiles = kv_pad // tile_k
    grid = (num_qo_heads, q_tiles, kv_tiles)

    offset = kv_len - qo_len

    def k_index(h, qi, kj, *extra):
        if causal:
            last_needed = jax.lax.div(qi * tile_q + tile_q - 1 + offset, tile_k)
            kj = jnp.minimum(kj, last_needed)
        return (h // group, kj, 0)

    in_specs = [
        pl.BlockSpec((1, tile_q, d_pad), lambda h, qi, kj: (h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_k, d_pad), k_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_k, dv_pad), k_index, memory_space=pltpu.VMEM),
    ]
    operands = [qh, kh, vh]

    has_mask = custom_mask is not None
    if has_mask:
        mask_pad = jnp.pad(
            custom_mask.astype(jnp.int8),
            ((0, qo_pad - qo_len), (0, kv_pad - kv_len)),
        )
        def mask_index(h, qi, kj, *extra):
            if causal:
                last_needed = jax.lax.div(
                    qi * tile_q + tile_q - 1 + offset, tile_k
                )
                kj = jnp.minimum(kj, last_needed)
            return (qi, kj)
        in_specs.append(
            pl.BlockSpec((tile_q, tile_k), mask_index, memory_space=pltpu.VMEM)
        )
        operands.append(mask_pad)

    has_sink = sink is not None
    if has_sink:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda h, qi, kj: (h, 0), memory_space=pltpu.VMEM)
        )
        operands.append(sink.astype(jnp.float32).reshape(num_qo_heads, 1))

    v_arrays, v_specs, rebuild = _variant_param_plumbing(
        variant_params, num_qo_heads, lambda h, qi, kj: h, 3
    )
    in_specs += v_specs
    operands += v_arrays

    kernel = functools.partial(
        _flash_kernel,
        num_variant_leaves=len(v_arrays),
        rebuild_params=rebuild,
        has_mask=has_mask,
        has_sink=has_sink,
        causal=causal,
        sm_scale=sm_scale,
        window_left=window_left,
        kv_len=kv_len,
        qo_len=qo_len,
        tile_q=tile_q,
        tile_k=tile_k,
        variant=variant,
        kv_tiles=kv_tiles,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile_q, dv_pad), lambda h, qi, kj: (h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, _LANES), lambda h, qi, kj: (h, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_qo_heads, qo_pad, dv_pad), q.dtype),
            jax.ShapeDtypeStruct((num_qo_heads, qo_pad, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, dv_pad), jnp.float32),
            pltpu.VMEM((tile_q, _LANES), jnp.float32),
            pltpu.VMEM((tile_q, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * qo_len * kv_len * num_qo_heads * (head_dim + head_dim_vo) // 2,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize
                + v.size * v.dtype.itemsize
            ),
            transcendentals=qo_len * kv_len * num_qo_heads,
        ),
        interpret=interpret,
    )(*operands)

    out = jnp.swapaxes(out, 0, 1)[:qo_len, :, :head_dim_vo]
    lse = jnp.swapaxes(lse[:, :, 0], 0, 1)[:qo_len]
    return out, lse
