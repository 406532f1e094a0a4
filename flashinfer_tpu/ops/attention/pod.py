"""POD attention: prefill-on-decode fusion.

Reference parity: flashinfer/pod.py:50 ``PODWithPagedKVCacheWrapper``
(plan :256, run :428) — a CUDA kernel that SM-partitions one chunked-prefill
request alongside a batch of decodes so both run concurrently
(include/flashinfer/attention/pod.cuh).

TPU re-design: SM partitioning has no TPU analogue (one sequential
TensorCore per chip), but the *purpose* — one launch serving mixed
prefill+decode without head-of-line blocking — is exactly what the unified
work-list design provides: the planner interleaves (prefill-tile, decode)
work items into ONE padded list executed by ONE Pallas kernel launch.

Single-launch mode needs the prefill chunk's KV in the same paged cache as
the decodes (pass ``prefill_page_indices`` at plan time): ``run`` appends
k_p/v_p into those pages — the append a chunked-prefill serving loop
performs anyway — then executes the combined work list in one
``batch_paged_attention_run``. Without ``prefill_page_indices`` the wrapper
falls back to two launches (dense prefill + paged decode), for callers
whose prefill KV never enters the page pool.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.attention.batch import BatchAttention
from flashinfer_tpu.ops.attention.single import single_prefill_with_kv_cache
from flashinfer_tpu.ops.page import append_paged_kv_cache

__all__ = ["PODWithPagedKVCacheWrapper"]


class PODWithPagedKVCacheWrapper:
    """One prefill + batch decode in one plan and ONE kernel launch."""

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "HND",
                 backend: str = "auto", **kw):
        self._attn = BatchAttention(kv_layout=kv_layout, backend=backend,
                                    **kw)
        self._layout = kv_layout
        self._backend = backend
        self._combined = False

    def plan(
        self,
        indptr,
        indices,
        last_page_len,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        page_size: int,
        *,
        sm_scale: Optional[float] = None,
        window_left: int = -1,
        logits_soft_cap: float = 0.0,
        prefill_qo_len: Optional[int] = None,
        prefill_kv_len: Optional[int] = None,
        prefill_page_indices: Optional[Sequence[int]] = None,
        causal_p: bool = True,
        kv_len_arr=None,
        **kwargs,
    ):
        """Plan the decode batch; when ``prefill_*`` args are given, plan the
        prefill request INTO THE SAME work list (single-launch POD)."""
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        last_page_len = np.asarray(last_page_len, np.int64)
        batch = len(indptr) - 1
        self._page_size = page_size
        self._combined = prefill_page_indices is not None

        if self._combined:
            assert prefill_qo_len is not None and prefill_kv_len is not None
            p_pages = np.asarray(prefill_page_indices, np.int64)
            need = -(-prefill_kv_len // page_size)
            assert len(p_pages) >= need, (len(p_pages), need)
            p_pages = p_pages[:need]
            self._prefill_shape = (int(prefill_qo_len), int(prefill_kv_len))
            self._prefill_pages = p_pages
            qo_indptr = np.concatenate(
                [[0, prefill_qo_len],
                 prefill_qo_len + np.arange(1, batch + 1)]
            )
            kv_indptr = np.concatenate([[0], need + indptr])
            kv_indices = np.concatenate([p_pages, indices])
            last = np.concatenate(
                [[(prefill_kv_len - 1) % page_size + 1], last_page_len]
            )
            kv_lens = None
            if kv_len_arr is not None:
                kv_lens = np.concatenate(
                    [[prefill_kv_len], np.asarray(kv_len_arr, np.int64)]
                )
            self._attn.plan(
                qo_indptr, kv_indptr, kv_indices, last,
                num_qo_heads, num_kv_heads, head_dim, page_size,
                causal=causal_p, sm_scale=sm_scale, window_left=window_left,
                logits_soft_cap=logits_soft_cap, kv_len_arr=kv_lens,
                **kwargs,
            )
        else:
            self._attn.plan(
                np.arange(batch + 1), indptr, indices, last_page_len,
                num_qo_heads, num_kv_heads, head_dim, page_size,
                causal=False, sm_scale=sm_scale, window_left=window_left,
                logits_soft_cap=logits_soft_cap, kv_len_arr=kv_len_arr,
                **kwargs,
            )
        self._prefill_cfg = dict(
            sm_scale=sm_scale, window_left=window_left,
            logits_soft_cap=logits_soft_cap,
        )
        return self

    def run(
        self,
        q_p: jax.Array,  # [qo_len, h, d] prefill queries
        k_p: jax.Array,  # [kv_len, hkv, d] prefill dense KV
        v_p: jax.Array,
        q_d: jax.Array,  # [batch, h, d] decode queries
        paged_kv_cache,
        *,
        causal_p: bool = True,
        return_lse: bool = False,
        **kwargs,
    ):
        """Returns ((prefill_out, decode_out), cache') in combined mode (the
        cache now holds the appended prefill KV), or (prefill_out,
        decode_out) in two-launch mode; lses appended when return_lse."""
        if self._combined:
            qo_len, kv_len = self._prefill_shape
            assert q_p.shape[0] == qo_len and k_p.shape[0] == kv_len
            npg = len(self._prefill_pages)
            pos = jnp.arange(kv_len, dtype=jnp.int32)
            paged_kv_cache = append_paged_kv_cache(
                k_p, v_p,
                jnp.zeros(kv_len, jnp.int32), pos, paged_kv_cache,
                jnp.asarray(self._prefill_pages, jnp.int32),
                jnp.asarray([0, npg], jnp.int32),
                jnp.asarray([(kv_len - 1) % self._page_size + 1], jnp.int32),
                kv_layout=self._layout,
            )
            q = jnp.concatenate([q_p, q_d], axis=0)
            out = self._attn.run(q, paged_kv_cache, return_lse=return_lse,
                                 **kwargs)
            if return_lse:
                o, lse = out
                return (o[:qo_len], o[qo_len:]), paged_kv_cache, \
                    (lse[:qo_len], lse[qo_len:])
            return (out[:qo_len], out[qo_len:]), paged_kv_cache

        p = single_prefill_with_kv_cache(
            q_p, k_p, v_p,
            causal=causal_p,
            return_lse=return_lse,
            backend=self._backend,
            **{k: v for k, v in self._prefill_cfg.items() if v is not None},
        )
        d = self._attn.run(q_d, paged_kv_cache, return_lse=return_lse,
                           **kwargs)
        if return_lse:
            (po, plse), (do, dlse) = p, d
            return (po, do), (plse, dlse)
        return p, d
