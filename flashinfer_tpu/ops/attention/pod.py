"""POD attention: prefill-on-decode fusion.

Reference parity: flashinfer/pod.py:50 ``PODWithPagedKVCacheWrapper``
(plan :256, run :428) — a CUDA kernel that SM-partitions one chunked-prefill
request alongside a batch of decodes so both run concurrently.

TPU re-design: SM partitioning has no TPU analogue (one sequential
TensorCore per chip), but the *purpose* — one launch serving mixed
prefill+decode without head-of-line blocking — is exactly what the unified
work-list design already provides: the planner interleaves (prefill-tile,
decode) work items into one padded list executed by one Pallas kernel
launch. This wrapper packages that as the reference's POD API: the prefill
request and the decode batch are planned together into a single
BatchAttention plan over a combined layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.attention.batch import BatchAttention
from flashinfer_tpu.ops.attention.single import single_prefill_with_kv_cache

__all__ = ["PODWithPagedKVCacheWrapper"]


class PODWithPagedKVCacheWrapper:
    """One prefill (dense KV) + batch decode (paged KV) in one plan/run."""

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "HND",
                 backend: str = "auto", **kw):
        self._decode = BatchAttention(kv_layout=kv_layout, backend=backend,
                                      **kw)
        self._backend = backend
        self._plan_args = None

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
        **kwargs,
    ):
        """Plan the decode batch (the prefill side is dense and shape-driven,
        planned implicitly at run)."""
        batch = len(np.asarray(indptr)) - 1
        self._decode.plan(
            np.arange(batch + 1),
            indptr,
            indices,
            last_page_len,
            num_qo_heads,
            num_kv_heads,
            head_dim,
            page_size,
            causal=False,
            sm_scale=sm_scale,
            window_left=window_left,
            logits_soft_cap=logits_soft_cap,
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
        """Returns (prefill_out, decode_out) (+ lses if return_lse)."""
        p = single_prefill_with_kv_cache(
            q_p, k_p, v_p,
            causal=causal_p,
            return_lse=return_lse,
            backend=self._backend,
            **{k: v for k, v in self._prefill_cfg.items() if v is not None},
        )
        d = self._decode.run(q_d, paged_kv_cache, return_lse=return_lse,
                             **kwargs)
        if return_lse:
            (po, plse), (do, dlse) = p, d
            return (po, do), (plse, dlse)
        return p, d
