"""Cascade (multi-level shared-prefix) attention.

Reference parity: flashinfer/cascade.py — ``MultiLevelCascadeAttentionWrapper``
(:228, plan :400, run :519) plus the merge primitives re-exported from
state.py (merge_state :46, merge_states :112, merge_state_in_place :172).

Idea (unchanged from the reference): requests sharing a prefix attend to the
shared KV once per *group* at the upper levels and to their unique suffix at
the last level; per-level (v, s) softmax states merge associatively. On TPU
each level is one planned batch-attention launch; the merge is the fused
segment math in state.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.attention.batch import BatchAttention
from flashinfer_tpu.ops.attention.state import (
    merge_state,
    merge_state_in_place,
    merge_states,
)

__all__ = [
    "MultiLevelCascadeAttentionWrapper",
    "merge_state",
    "merge_states",
    "merge_state_in_place",
]


class MultiLevelCascadeAttentionWrapper:
    """Multi-level cascade attention over a shared paged KV cache.

    Levels are ordered top (most-shared prefix) to bottom (unique suffix);
    causal masking applies only at the last level (the earlier levels hold
    strictly-past prefix tokens), matching the reference's level semantics
    (cascade.py:400 plan's per-level wrappers).
    """

    def __init__(self, num_levels: int, kv_layout: str = "HND", **wrapper_kw):
        self._num_levels = num_levels
        self._wrappers = [
            BatchAttention(kv_layout=kv_layout, **wrapper_kw)
            for _ in range(num_levels)
        ]

    def plan(
        self,
        qo_indptr_arr: Sequence[np.ndarray],
        paged_kv_indptr_arr: Sequence[np.ndarray],
        paged_kv_indices_arr: Sequence[np.ndarray],
        paged_kv_last_page_len_arr: Sequence[np.ndarray],
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        page_size: int,
        *,
        causal: bool = True,
        sm_scale: Optional[float] = None,
        window_left: int = -1,
        logits_soft_cap: float = 0.0,
        **kwargs,
    ):
        assert len(qo_indptr_arr) == self._num_levels
        self._nnz = int(np.asarray(qo_indptr_arr[-1])[-1])
        for lvl, w in enumerate(self._wrappers):
            last_level = lvl == self._num_levels - 1
            w.plan(
                qo_indptr_arr[lvl],
                paged_kv_indptr_arr[lvl],
                paged_kv_indices_arr[lvl],
                paged_kv_last_page_len_arr[lvl],
                num_qo_heads,
                num_kv_heads,
                head_dim,
                page_size,
                causal=causal and last_level,
                sm_scale=sm_scale,
                window_left=window_left if last_level else -1,
                logits_soft_cap=logits_soft_cap,
                **kwargs,
            )
        return self

    def run(
        self,
        q: jax.Array,
        paged_kv_cache,
        *,
        return_lse: bool = False,
        **kwargs,
    ):
        """q: [nnz, num_qo_heads, head_dim]; all levels read the same cache."""
        v_merged = None
        s_merged = None
        for w in self._wrappers:
            out, lse = w.run(q, paged_kv_cache, return_lse=True, **kwargs)
            if v_merged is None:
                v_merged, s_merged = out, lse
            else:
                v_merged, s_merged = merge_state(v_merged, s_merged, out, lse)
        if return_lse:
            return v_merged, s_merged
        return v_merged
