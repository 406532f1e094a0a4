"""Block-sparse and variable-block-sparse attention.

Reference parity: flashinfer/sparse.py — ``BlockSparseAttentionWrapper``
(:65) and ``VariableBlockSparseAttentionWrapper`` (:704). The reference
reuses its paged-prefill kernel by treating BSR blocks as pages, converting
to per-token ("vector sparse") offsets for the fa3 path (page.py:49).

Same trick here, zero-copy: a dense K [N, h, d] *reshaped* to
[N/C, C, h, d] IS an NHD paged cache whose page table is the BSR column
index array — the paged Pallas kernel gathers blocks directly. Variable
block sizes fall back to page_size=1 (vector-sparse), exactly like the
reference's fa3 conversion path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.attention.batch import BatchAttention

__all__ = ["BlockSparseAttentionWrapper", "VariableBlockSparseAttentionWrapper"]


class BlockSparseAttentionWrapper(BatchAttention):
    """BSR attention: M×N sparsity with fixed (R, C) blocks
    (reference sparse.py:65)."""

    def __init__(self, float_workspace_buffer=None, backend: str = "auto",
                 **kw):
        super().__init__(kv_layout="NHD", backend=backend, **kw)
        self._C = None

    def plan(
        self,
        indptr,
        indices,
        M: int,
        N: int,
        R: int,
        C: int,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        *,
        mask=None,
        sm_scale: Optional[float] = None,
        **kwargs,
    ):
        """indptr/indices: BSR over (M/R) × (N/C) blocks. Each query block
        row becomes one planned request whose pages are its column blocks."""
        assert M % R == 0 and N % C == 0
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        mb = M // R
        assert len(indptr) == mb + 1
        self._C = C
        self._R = R
        qo_indptr = np.arange(mb + 1) * R
        nnz_blocks = indptr[1:] - indptr[:-1]
        last_page_len = np.full(mb, C, np.int64)
        return super().plan(
            qo_indptr,
            indptr,
            indices,
            last_page_len,
            num_qo_heads,
            num_kv_heads,
            head_dim,
            page_size=C,
            causal=False,  # sparsity pattern defines visibility
            sm_scale=sm_scale,
            **kwargs,
        )

    def run(self, q: jax.Array, k: jax.Array, v: jax.Array, **kwargs):
        """q: [M, hq, d]; k/v: [N, hkv, d] dense — reshaped (no copy) into
        the NHD page view [N/C, C, hkv, d]."""
        C = self._C
        k_pages = k.reshape(k.shape[0] // C, C, k.shape[1], k.shape[2])
        v_pages = v.reshape(v.shape[0] // C, C, v.shape[1], v.shape[2])
        return super().run(q, (k_pages, v_pages), **kwargs)


class VariableBlockSparseAttentionWrapper(BatchAttention):
    """Variable block-size sparse attention (reference sparse.py:704):
    block_row_sz / block_col_sz give per-block extents; converted to
    vector-sparse (page_size=1) token indices like the reference's
    block_sparse_indices_to_vector_sparse_offsets path."""

    def __init__(self, float_workspace_buffer=None, backend: str = "auto",
                 **kw):
        super().__init__(kv_layout="NHD", backend=backend, **kw)

    def plan(
        self,
        block_mask_map,  # [MB, NB] bool — which (row-block, col-block) attend
        block_row_sz,  # [MB]
        block_col_sz,  # [NB]
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        *,
        sm_scale: Optional[float] = None,
        **kwargs,
    ):
        block_mask_map = np.asarray(block_mask_map, bool)
        block_row_sz = np.asarray(block_row_sz, np.int64)
        block_col_sz = np.asarray(block_col_sz, np.int64)
        mb, nb = block_mask_map.shape
        col_starts = np.concatenate([[0], np.cumsum(block_col_sz)])
        qo_indptr = np.concatenate([[0], np.cumsum(block_row_sz)])

        token_indices = []
        kv_indptr = [0]
        for rb in range(mb):
            cols = np.nonzero(block_mask_map[rb])[0]
            toks = [np.arange(col_starts[c], col_starts[c + 1]) for c in cols]
            toks = np.concatenate(toks) if toks else np.zeros(0, np.int64)
            token_indices.append(toks)
            kv_indptr.append(kv_indptr[-1] + len(toks))
        kv_indices = (
            np.concatenate(token_indices) if token_indices else np.zeros(0)
        )
        last_page_len = np.ones(mb, np.int64)
        return super().plan(
            qo_indptr,
            np.asarray(kv_indptr),
            kv_indices,
            last_page_len,
            num_qo_heads,
            num_kv_heads,
            head_dim,
            page_size=1,
            causal=False,
            sm_scale=sm_scale,
            **kwargs,
        )

    def run(self, q: jax.Array, k: jax.Array, v: jax.Array, **kwargs):
        k_pages = k.reshape(k.shape[0], 1, k.shape[1], k.shape[2])
        v_pages = v.reshape(v.shape[0], 1, v.shape[1], v.shape[2])
        return super().run(q, (k_pages, v_pages), **kwargs)
