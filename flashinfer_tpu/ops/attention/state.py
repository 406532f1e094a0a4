"""Softmax-state merge algebra.

The reference keeps a per-(query, head) online-softmax state ``(m, d, o)``
(include/flashinfer/attention/state.cuh) and merges partial attention outputs
with kernels in include/flashinfer/attention/cascade.cuh (MergeStateKernel:45,
MergeStatesKernel, PersistentVariableLengthMergeStatesKernel:368). Public
Python API: flashinfer/cascade.py merge_state:46, merge_states:112,
merge_state_in_place:172.

Here the state is ``(v, s)`` where ``v`` is the normalized attention output
and ``s`` is the log-sum-exp (natural log, pre-scaled logits). Merging is a
pure associative reduction, so on TPU we express it as jnp ops and let XLA
fuse; there is no need for a hand-rolled kernel until profiling says so —
the op is trivially memory-bound elementwise math.

All functions accept f32/bf16 ``v`` and f32 ``s`` and return the same dtypes
as the reference (v dtype preserved, s float32).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "merge_state",
    "merge_state_in_place",
    "merge_states",
    "variable_length_merge_states",
    "scatter_merge_states",
    "gather_merge_states",
]

_NEG_INF = float("-inf")


def _merge2(v_a, s_a, v_b, s_b):
    s_a = s_a.astype(jnp.float32)
    s_b = s_b.astype(jnp.float32)
    s_max = jnp.maximum(s_a, s_b)
    # Guard fully-masked states: exp(-inf - -inf) -> exp(nan). Where both are
    # -inf the weights become 0/0; define the result as zeros with s=-inf.
    a_w = jnp.exp(jnp.where(jnp.isneginf(s_a), _NEG_INF, s_a - jnp.where(jnp.isneginf(s_max), 0.0, s_max)))
    b_w = jnp.exp(jnp.where(jnp.isneginf(s_b), _NEG_INF, s_b - jnp.where(jnp.isneginf(s_max), 0.0, s_max)))
    d = a_w + b_w
    s_out = s_max + jnp.log(jnp.where(d > 0, d, 1.0))
    s_out = jnp.where(d > 0, s_out, _NEG_INF)
    scale_a = jnp.where(d > 0, a_w / jnp.where(d > 0, d, 1.0), 0.0)
    scale_b = jnp.where(d > 0, b_w / jnp.where(d > 0, d, 1.0), 0.0)
    v_out = (
        v_a.astype(jnp.float32) * scale_a[..., None]
        + v_b.astype(jnp.float32) * scale_b[..., None]
    )
    return v_out.astype(v_a.dtype), s_out


def merge_state(
    v_a: jax.Array, s_a: jax.Array, v_b: jax.Array, s_b: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Merge two attention states.

    Args:
      v_a/v_b: [seq_len, num_heads, head_dim] partial outputs.
      s_a/s_b: [seq_len, num_heads] log-sum-exp (base e, pre-softmax-scale
        applied, matching the kernels in this package).

    Reference parity: flashinfer/cascade.py:46 merge_state.
    """
    return _merge2(v_a, s_a, v_b, s_b)


def merge_state_in_place(
    v: jax.Array,
    s: jax.Array,
    v_other: jax.Array,
    s_other: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Functional analogue of flashinfer/cascade.py:172 merge_state_in_place
    (JAX is functional: returns the updated (v, s) instead of mutating).

    ``mask``: optional [seq_len] bool; rows where mask is False keep (v, s).
    """
    v_new, s_new = _merge2(v, s, v_other, s_other)
    if mask is not None:
        keep = mask[:, None]
        s_new = jnp.where(keep, s_new, s)
        v_new = jnp.where(keep[..., None], v_new, v)
    return v_new, s_new


def merge_states(v: jax.Array, s: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Merge ``num_states`` attention states.

    Args:
      v: [seq_len, num_states, num_heads, head_dim]
      s: [seq_len, num_states, num_heads]

    Reference parity: flashinfer/cascade.py:112 merge_states
    (kernel cascade.cuh MergeStatesKernel).
    """
    s = s.astype(jnp.float32)
    s_max = jnp.max(s, axis=1, keepdims=True)
    s_max_safe = jnp.where(jnp.isneginf(s_max), 0.0, s_max)
    w = jnp.exp(s - s_max_safe)  # [seq, states, heads]
    w = jnp.where(jnp.isneginf(s), 0.0, w)
    d = jnp.sum(w, axis=1)  # [seq, heads]
    v_out = jnp.einsum(
        "lshd,lsh->lhd", v.astype(jnp.float32), w, preferred_element_type=jnp.float32
    )
    safe_d = jnp.where(d > 0, d, 1.0)
    v_out = v_out / safe_d[..., None]
    s_out = jnp.where(d > 0, s_max[:, 0] + jnp.log(safe_d), _NEG_INF)
    return v_out.astype(v.dtype), s_out


def variable_length_merge_states(
    v: jax.Array,
    s: jax.Array,
    merge_indptr: jax.Array,
    num_rows: int,
) -> Tuple[jax.Array, jax.Array]:
    """Segment-merge partial states produced by split-KV attention.

    Partial states for output row ``i`` live at rows
    ``merge_indptr[i] : merge_indptr[i+1]`` of ``v``/``s`` (the reference's
    PersistentVariableLengthMergeStatesKernel, cascade.cuh:368). Implemented
    as a segment softmax-combine with jax.ops.segment_* so XLA lowers it to
    fused scatter-reduces — variable lengths, static shapes.

    Args:
      v: [total_partials, num_heads, head_dim]
      s: [total_partials, num_heads]
      merge_indptr: [num_rows + 1] int32
      num_rows: static output row count.
    """
    total = v.shape[0]
    # map each partial row -> output row id
    row_of_partial = (
        jnp.searchsorted(merge_indptr, jnp.arange(total, dtype=merge_indptr.dtype), side="right") - 1
    )
    return scatter_merge_states(v, s, row_of_partial, num_rows)


def gather_merge_states(
    partial_o: jax.Array,  # [T, num_heads, tile_q, dv]
    partial_lse: jax.Array,  # [T, num_heads, tile_q] f32
    merge_src: jax.Array,  # [num_rows, max_splits] flat partial index or -1
    tile_q: int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather-based split-KV merge: for each output row, gather its (few)
    partials and softmax-combine.

    Replaces scatter_merge_states on the run hot path: segment scatters over
    an f32 accumulation buffer lower to slow sorted-scatter loops on TPU,
    while this is max_splits fused gathers + elementwise math (profiled ~4x
    cheaper for prefill shapes). Reference analogue: VariableLengthMergeStates
    (cascade.cuh:687).

    Returns (merged_o [num_rows, num_heads, dv], merged_lse f32).
    """
    num_rows, max_splits = merge_src.shape
    T, h, tq, dv = partial_o.shape
    w_idx = jnp.clip(merge_src // tile_q, 0, T - 1)
    j_idx = jnp.clip(merge_src % tile_q, 0, tq - 1)
    valid = merge_src >= 0

    lses = []
    for s in range(max_splits):
        lse_s = partial_lse[w_idx[:, s], :, j_idx[:, s]]  # [rows, h]
        lses.append(jnp.where(valid[:, s : s + 1], lse_s, _NEG_INF))
    lse_all = jnp.stack(lses, axis=1)  # [rows, S, h]
    m = jnp.max(lse_all, axis=1)  # [rows, h]
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    wgt = jnp.where(
        jnp.isneginf(lse_all), 0.0, jnp.exp(lse_all - m_safe[:, None, :])
    )  # [rows, S, h]
    denom = jnp.sum(wgt, axis=1)  # [rows, h]

    acc = jnp.zeros((num_rows, h, dv), jnp.float32)
    for s in range(max_splits):
        o_s = partial_o[w_idx[:, s], :, j_idx[:, s], :]  # [rows, h, dv]
        acc = acc + o_s.astype(jnp.float32) * wgt[:, s, :, None]
    safe_d = jnp.where(denom > 0, denom, 1.0)
    merged = (acc / safe_d[..., None]).astype(partial_o.dtype)
    merged_lse = jnp.where(
        denom > 0, m_safe + jnp.log(safe_d), _NEG_INF
    )
    return merged, merged_lse


def scatter_merge_states(
    v: jax.Array,
    s: jax.Array,
    out_row: jax.Array,
    num_rows: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge partial states into output rows given an arbitrary row map.

    ``out_row[i]`` is the destination row of partial i; negative entries are
    dropped (padding work items). Used by the plan/run wrappers to combine
    split-KV partials (the role of the reference's
    PersistentVariableLengthMergeStatesKernel, cascade.cuh:368).

    Args:
      v: [total_partials, num_heads, head_dim]
      s: [total_partials, num_heads] (may contain NaN/garbage on dropped rows)
    """
    row_of_partial = jnp.where(out_row >= 0, out_row, num_rows)  # trash slot
    s = s.astype(jnp.float32)
    # sanitize dropped rows so NaN/garbage partials cannot propagate
    dropped = (out_row < 0)[:, None]
    s = jnp.where(dropped, _NEG_INF, s)
    nseg = num_rows + 1
    s_max = jax.ops.segment_max(s, row_of_partial, num_segments=nseg)
    s_max_g = s_max[row_of_partial]
    s_max_safe = jnp.where(jnp.isneginf(s_max_g), 0.0, s_max_g)
    w = jnp.where(jnp.isneginf(s), 0.0, jnp.exp(s - s_max_safe))
    d = jax.ops.segment_sum(w, row_of_partial, num_segments=nseg)
    v_w = jnp.where(dropped[..., None], 0.0, v.astype(jnp.float32)) * w[..., None]
    v_sum = jax.ops.segment_sum(v_w, row_of_partial, num_segments=nseg)
    safe_d = jnp.where(d > 0, d, 1.0)
    v_out = v_sum / safe_d[..., None]
    s_out = jnp.where(
        d > 0, jnp.where(jnp.isneginf(s_max), 0.0, s_max) + jnp.log(safe_d), _NEG_INF
    )
    return v_out[:num_rows].astype(v.dtype), s_out[:num_rows]
