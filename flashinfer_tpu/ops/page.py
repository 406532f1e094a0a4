"""Paged KV-cache data model and page operations.

Reference parity: flashinfer/page.py (`append_paged_kv_cache`:299,
`append_paged_mla_kv_cache`:250, `get_batch_indices_positions`:169,
`get_seq_lens`:224) and the paged_kv_t struct (include/flashinfer/page.cuh:38).

Data model (functional, XLA-friendly):
  * page table:  ``kv_indptr``  [batch+1] int32 — CSR offsets into
    ``kv_indices`` [total_pages] int32 (page ids per request, in order), plus
    ``kv_last_page_len`` [batch] int32 (1..page_size valid entries in the
    request's final page).
  * cache tensors: either a tuple ``(k_cache, v_cache)`` or one tensor with a
    leading ``2`` on dim 1. Layouts: NHD = [pages, page_size, heads, dim],
    HND = [pages, heads, page_size, dim]. On TPU we favor NHD: head_dim=128
    rides the lane dimension and page_size the sublanes, so a page is a
    naturally tiled (page_size, 128) block per head.

Appending is a functional scatter (``cache.at[...].set``); XLA lowers it to
an in-place dynamic-update when the cache is a donated buffer. The serving
loop donates the cache, so no copy happens in steady state.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from flashinfer_tpu.utils import TensorLayout, check_kv_layout

__all__ = [
    "get_seq_lens",
    "get_batch_indices_positions",
    "append_paged_kv_cache",
    "append_paged_mla_kv_cache",
    "unpack_paged_kv_cache",
    "block_sparse_indices_to_vector_sparse_offsets",
]

KVCache = Union[jax.Array, Tuple[jax.Array, jax.Array]]


def unpack_paged_kv_cache(
    paged_kv_cache: KVCache, kv_layout: str | TensorLayout = "NHD"
) -> Tuple[jax.Array, jax.Array]:
    """Canonicalize a paged cache to (k, v) each in NHD
    [num_pages, page_size, num_kv_heads, head_dim].

    Reference analogue: flashinfer/utils.py _unpack_paged_kv_cache."""
    layout = check_kv_layout(kv_layout)
    if isinstance(paged_kv_cache, (tuple, list)):
        k, v = paged_kv_cache
    else:
        if paged_kv_cache.shape[1] != 2:
            raise ValueError(
                "single-tensor paged cache must be [pages, 2, ...]; got "
                f"{paged_kv_cache.shape}"
            )
        k = paged_kv_cache[:, 0]
        v = paged_kv_cache[:, 1]
    if layout == TensorLayout.HND:
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    return k, v


def get_seq_lens(
    kv_indptr: jax.Array, kv_last_page_len: jax.Array, page_size: int
) -> jax.Array:
    """Per-request KV sequence length (flashinfer/page.py:224)."""
    num_pages = kv_indptr[1:] - kv_indptr[:-1]
    return jnp.where(
        num_pages > 0,
        (num_pages - 1) * page_size + kv_last_page_len,
        0,
    ).astype(jnp.int32)


def get_batch_indices_positions(
    append_indptr: jax.Array, seq_lens: jax.Array, nnz: int
) -> Tuple[jax.Array, jax.Array]:
    """For ``nnz`` tokens packed by ``append_indptr`` (CSR over requests),
    return each token's (request index, absolute position in its sequence).
    Position convention matches flashinfer/page.py:169: the appended tokens
    are the *last* tokens of the sequence.
    """
    token = jnp.arange(nnz, dtype=jnp.int32)
    batch_indices = (
        jnp.searchsorted(append_indptr, token, side="right").astype(jnp.int32) - 1
    )
    append_start = append_indptr[batch_indices]
    append_len = append_indptr[batch_indices + 1] - append_start
    positions = seq_lens[batch_indices] - append_len + (token - append_start)
    return batch_indices, positions.astype(jnp.int32)


def _scatter_tokens(
    cache: jax.Array,  # NHD [pages, page_size, heads, dim]
    tokens: jax.Array,  # [nnz, heads, dim]
    page_ids: jax.Array,  # [nnz]
    entry_ids: jax.Array,  # [nnz]
    valid: jax.Array,  # [nnz] bool
) -> jax.Array:
    # Invalid (padding) rows are routed out of bounds and dropped by the
    # scatter — never write-back reads, which would clobber a genuine write
    # when a valid token targets the same slot.
    page_ids = jnp.where(valid, page_ids, cache.shape[0])
    return cache.at[page_ids, entry_ids].set(
        tokens.astype(cache.dtype), mode="drop"
    )


def append_paged_kv_cache(
    append_key: jax.Array,
    append_value: jax.Array,
    batch_indices: jax.Array,
    positions: jax.Array,
    paged_kv_cache: KVCache,
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array,
    kv_layout: str | TensorLayout = "NHD",
    *,
    valid: Optional[jax.Array] = None,
) -> KVCache:
    """Append new K/V tokens into the paged cache (functional).

    Reference parity: flashinfer/page.py:299 append_paged_kv_cache /
    kernel include/flashinfer/page.cuh:223 AppendPagedKVCacheKernel.

    Args:
      append_key/append_value: [nnz, num_kv_heads, head_dim].
      batch_indices/positions: per-token routing (see
        get_batch_indices_positions).
      valid: optional [nnz] bool — False rows are no-ops (static-shape
        padding support for jit serving loops).

    Returns the updated cache in the same container/layout as the input.
    """
    layout = check_kv_layout(kv_layout)
    k, v = unpack_paged_kv_cache(paged_kv_cache, layout)
    page_size = k.shape[1]
    nnz = append_key.shape[0]
    if valid is None:
        valid = jnp.ones((nnz,), dtype=bool)

    page_slot = positions // page_size
    entry_ids = positions % page_size
    page_ids = kv_indices[kv_indptr[batch_indices] + page_slot]

    k = _scatter_tokens(k, append_key, page_ids, entry_ids, valid)
    v = _scatter_tokens(v, append_value, page_ids, entry_ids, valid)

    if layout == TensorLayout.HND:
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    if isinstance(paged_kv_cache, (tuple, list)):
        return type(paged_kv_cache)((k, v))
    return jnp.stack([k, v], axis=1)


def append_paged_mla_kv_cache(
    append_ckv: jax.Array,
    append_kpe: jax.Array,
    batch_indices: jax.Array,
    positions: jax.Array,
    ckv_cache: jax.Array,
    kpe_cache: jax.Array,
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array,
    *,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """MLA variant (flashinfer/page.py:250): caches are headless —
    ckv_cache [pages, page_size, ckv_dim(512)], kpe_cache [pages, page_size,
    kpe_dim(64)]; append_ckv/append_kpe are [nnz, dim]."""
    nnz = append_ckv.shape[0]
    if valid is None:
        valid = jnp.ones((nnz,), dtype=bool)
    page_size = ckv_cache.shape[1]
    page_slot = positions // page_size
    entry_ids = positions % page_size
    page_ids = kv_indices[kv_indptr[batch_indices] + page_slot]
    def scatter(cache, tokens):
        # out-of-bounds routing for padding rows; dropped by the scatter
        pids = jnp.where(valid, page_ids, cache.shape[0])
        return cache.at[pids, entry_ids].set(
            tokens.astype(cache.dtype), mode="drop"
        )

    return scatter(ckv_cache, append_ckv), scatter(kpe_cache, append_kpe)


def block_sparse_indices_to_vector_sparse_offsets(
    block_sparse_indices: jax.Array,
    block_sparse_indptr: jax.Array,
    vector_sparse_offsets: jax.Array,
    vector_sparse_indptr: jax.Array,
    kv_lens: jax.Array,
    stride_block: int,
    stride_n: int,
    block_size: int,
) -> jax.Array:
    """Convert block-sparse indices to per-token offsets
    (flashinfer/page.py:49; kernel page.cuh:287). On TPU this feeds the
    vector-sparse (page_size=1) attention path.

    Returns the filled ``vector_sparse_offsets`` (functional update).
    """
    if block_size == 1 and stride_block == stride_n:
        return block_sparse_indices * stride_n
    num_out = vector_sparse_offsets.shape[0]
    token = jnp.arange(num_out, dtype=jnp.int32)
    row = (
        jnp.searchsorted(vector_sparse_indptr, token, side="right").astype(jnp.int32)
        - 1
    )
    row = jnp.clip(row, 0, block_sparse_indptr.shape[0] - 2)
    elem = token - vector_sparse_indptr[row]
    in_bounds = elem < kv_lens[row]
    blk = elem // block_size
    off_in_blk = elem % block_size
    src = block_sparse_indices[
        jnp.clip(block_sparse_indptr[row] + blk, 0, block_sparse_indices.shape[0] - 1)
    ]
    offsets = src * stride_block + off_in_blk * stride_n
    return jnp.where(in_bounds, offsets, 0).astype(vector_sparse_offsets.dtype)
