"""Pure-JAX attention oracle.

Role parity with the reference's test oracles (tests/test_helpers/*.py —
alibi_reference.py, rope_reference.py, sink_attention_reference.py): a
straight-line softmax attention that every Pallas kernel is validated
against. Also serves as the non-TPU fallback execution path.

Computes exact (non-flash) attention with all variant hooks applied and
returns ``(out, lse)`` where lse is natural-log log-sum-exp of the scaled
logits — the same state convention as flashinfer's return_lse=True outputs
(flashinfer/prefill.py run(return_lse=True)).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.attention.variants import AttentionVariant, DefaultAttention
from flashinfer_tpu.utils import MaskMode, expand_gqa

__all__ = ["attention_reference"]

_NEG_INF = float("-inf")


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_len: Optional[jax.Array] = None,
    q_start: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    window_left: int = -1,
    logits_soft_cap: float = 0.0,
    custom_mask: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    sink: Optional[jax.Array] = None,
    variant: AttentionVariant = DefaultAttention,
    variant_params=None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact attention.

    Args:
      q: [qo_len, num_qo_heads, head_dim]
      k/v: [kv_len, num_kv_heads, head_dim(_vo for v)]
      causal: lower-triangular mask aligned to the *end* of kv (query i has
        absolute position kv_len - qo_len + i), matching the reference
        (include/flashinfer/attention/prefill.cuh causal offset logic).
      kv_len: optional dynamic valid kv length (tokens >= kv_len masked).
      q_start: optional dynamic absolute position of q row 0 (defaults to
        kv_len - qo_len for causal alignment).
      window_left: sliding window size; -1 = disabled.
      custom_mask: [qo_len, kv_len] bool, True = keep.
      sink: [num_qo_heads] extra softmax-denominator logits (attention
        sinks, reference jit/attention/variants.py:17-169).

    Returns:
      out [qo_len, num_qo_heads, head_dim_vo] (q dtype), lse [qo_len, heads] f32.
    """
    qo_len, num_qo_heads, head_dim = q.shape
    total_kv = k.shape[0]
    head_dim_vo = v.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)

    k = expand_gqa(k, num_qo_heads)
    v = expand_gqa(v, num_qo_heads)

    qf = q.astype(jnp.float32)
    if variant.query_transform is not None:
        qf = variant.query_transform(variant_params, qf)

    # [heads, qo, kv]
    logits = jnp.einsum(
        "qhd,khd->hqk", qf, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    logits = logits * sm_scale

    valid_kv = jnp.asarray(total_kv if kv_len is None else kv_len, jnp.int32)
    q_pos0 = valid_kv - qo_len if q_start is None else jnp.asarray(q_start, jnp.int32)
    q_pos = jnp.arange(qo_len, dtype=jnp.int32)[:, None] + q_pos0  # [qo,1]
    kv_pos = jnp.arange(total_kv, dtype=jnp.int32)[None, :]  # [1,kv]

    head_idx = jnp.arange(num_qo_heads, dtype=jnp.int32)[:, None, None]
    if variant.logits_transform is not None:
        logits = variant.logits_transform(
            variant_params, logits, q_pos, kv_pos, head_idx
        )
    if alibi_slopes is not None:
        logits = logits + alibi_slopes[:, None, None] * (
            kv_pos[None] - q_pos[None]
        ).astype(jnp.float32)

    mask = kv_pos < valid_kv
    if causal:
        mask = mask & (kv_pos <= q_pos)
    if window_left >= 0:
        mask = mask & (kv_pos > q_pos - window_left - 1)
    if custom_mask is not None:
        mask = mask & custom_mask
    mask = jnp.broadcast_to(mask[None], logits.shape)  # [h, q, kv]
    if variant.logits_mask is not None:
        mask = mask & variant.logits_mask(variant_params, q_pos, kv_pos, head_idx)

    logits = jnp.where(mask, logits, _NEG_INF)

    if not variant.use_softmax:
        weights = logits  # transform already produced weights
        weights = jnp.where(mask, weights, 0.0)
        out = jnp.einsum(
            "hqk,khd->qhd", weights, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        lse = jnp.zeros((qo_len, num_qo_heads), jnp.float32)
    else:
        m = jnp.max(logits, axis=-1)  # [h, q]
        sink_logit = None
        if sink is not None:
            sink_logit = sink.astype(jnp.float32)[:, None]  # [h,1]
            m = jnp.maximum(m, sink_logit)
        elif variant.sink_logits is not None:
            sink_logit = variant.sink_logits(variant_params).astype(jnp.float32)[:, None]
            m = jnp.maximum(m, sink_logit)
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        p = jnp.exp(logits - m_safe[..., None])
        p = jnp.where(mask, p, 0.0)
        d = jnp.sum(p, axis=-1)  # [h, q]
        if sink_logit is not None:
            d = d + jnp.exp(sink_logit - m_safe)
        safe_d = jnp.where(d > 0, d, 1.0)
        out = jnp.einsum(
            "hqk,khd->qhd", p / safe_d[..., None], v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        lse = jnp.where(d > 0, m_safe + jnp.log(safe_d), _NEG_INF).T  # [q, h]

    if variant.output_transform is not None:
        out = variant.output_transform(variant_params, out)
    return out.astype(q.dtype), lse
