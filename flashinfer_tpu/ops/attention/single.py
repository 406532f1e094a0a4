"""Single-request attention ops.

Reference parity: flashinfer/prefill.py:911 ``single_prefill_with_kv_cache``
and flashinfer/decode.py:350 ``single_decode_with_kv_cache``.

Backend selection (the TPU analogue of determine_attention_backend,
reference utils.py:390): "pallas" runs the Mosaic kernel (interpreted off
TPU), "reference" runs the pure-JAX oracle (useful on CPU and as the
always-correct fallback), "auto" picks pallas on TPU else reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.attention.kernels.flash import flash_attention_dense
from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.attention.variants import (
    AttentionVariant,
    DefaultAttention,
    make_default_variant,
)
from flashinfer_tpu.utils import (
    PosEncodingMode,
    TensorLayout,
    check_kv_layout,
    on_tpu,
)

__all__ = [
    "single_prefill_with_kv_cache",
    "single_decode_with_kv_cache",
    "default_alibi_slopes",
]


def default_alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi slope schedule (press et al.); reference computes the
    same in include/flashinfer/pos_enc.cuh get_alibi_slope."""
    closest_pow2 = 2 ** math.floor(math.log2(num_heads))
    base = jnp.arange(1, closest_pow2 + 1, dtype=jnp.float32)
    slopes = 2.0 ** (-8.0 * base / closest_pow2)
    if closest_pow2 != num_heads:
        extra = jnp.arange(1, 2 * (num_heads - closest_pow2) + 1, 2, dtype=jnp.float32)
        extra_slopes = 2.0 ** (-4.0 * extra / closest_pow2)
        slopes = jnp.concatenate([slopes, extra_slopes])
    return slopes[:num_heads]


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pallas" if on_tpu() else "reference"
    return backend


def _canon_pos_mode(mode) -> PosEncodingMode:
    if isinstance(mode, str):
        return PosEncodingMode[mode.upper()]
    return PosEncodingMode(mode)


def single_prefill_with_kv_cache(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    custom_mask: Optional[jax.Array] = None,
    packed_custom_mask: Optional[jax.Array] = None,
    causal: bool = False,
    kv_layout: str = "NHD",
    pos_encoding_mode: Union[str, PosEncodingMode] = "NONE",
    sm_scale: Optional[float] = None,
    window_left: int = -1,
    logits_soft_cap: float = 0.0,
    sink: Optional[jax.Array] = None,
    return_lse: bool = False,
    backend: str = "auto",
    variant: Optional[AttentionVariant] = None,
    variant_params: Any = None,
):
    """Prefill/append attention between q and a dense KV (reference
    flashinfer/prefill.py:911-1203).

    q: [qo_len, num_qo_heads, head_dim]; k/v per kv_layout (NHD:
    [kv_len, num_kv_heads, head_dim], HND: [num_kv_heads, kv_len, head_dim]).
    """
    layout = check_kv_layout(kv_layout)
    if layout == TensorLayout.HND:
        k = jnp.swapaxes(k, 0, 1)
        v = jnp.swapaxes(v, 0, 1)

    if packed_custom_mask is not None and custom_mask is None:
        # reference prefill.py:1019 packed uint8 mask (quantization.py:57)
        from flashinfer_tpu.ops.quantization import unpackbits

        n = q.shape[0] * (k.shape[0])
        custom_mask = unpackbits(
            jnp.asarray(packed_custom_mask, jnp.uint8), n
        ).reshape(q.shape[0], k.shape[0]).astype(bool)

    mode = _canon_pos_mode(pos_encoding_mode)
    num_qo_heads = q.shape[1]
    alibi = None
    if mode == PosEncodingMode.ALIBI:
        alibi = default_alibi_slopes(num_qo_heads)
    elif mode == PosEncodingMode.ROPE_LLAMA:
        # reference applies Llama RoPE inside the kernel (pos_enc_mode
        # ROPE_LLAMA, pos_enc.cuh). On TPU the rotation is one elementwise
        # pass XLA fuses with the q/k producers — applied here so the
        # one-call fused-RoPE API works without a dedicated kernel path.
        # Query tokens sit at the sequence tail (append convention).
        from flashinfer_tpu.ops.rope import apply_rope_pos_ids

        qo_len, kv_len = q.shape[0], k.shape[0]
        q_pos = kv_len - qo_len + jnp.arange(qo_len, dtype=jnp.int32)
        k_pos = jnp.arange(kv_len, dtype=jnp.int32)
        q, _ = apply_rope_pos_ids(q, q[:, :1], q_pos)
        k, _ = apply_rope_pos_ids(k, k[:, :1], k_pos)

    if variant is None:
        variant = make_default_variant(
            logits_soft_cap=logits_soft_cap,
            use_alibi=False,
            has_sink=False,
        )
        if alibi is not None:
            variant_params = {"alibi_slopes": alibi}
            variant = make_default_variant(
                logits_soft_cap=logits_soft_cap, use_alibi=True
            )

    bk = _resolve_backend(backend)
    if bk == "reference":
        out, lse = attention_reference(
            q, k, v,
            causal=causal,
            sm_scale=sm_scale,
            window_left=window_left,
            custom_mask=custom_mask,
            sink=sink,
            variant=variant,
            variant_params=variant_params,
        )
    elif bk == "pallas":
        out, lse = flash_attention_dense(
            q, k, v,
            causal=causal,
            sm_scale=sm_scale,
            window_left=window_left,
            custom_mask=custom_mask,
            sink=sink,
            variant=variant,
            variant_params=variant_params,
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return (out, lse) if return_lse else out


def single_decode_with_kv_cache(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_layout: str = "NHD",
    pos_encoding_mode: Union[str, PosEncodingMode] = "NONE",
    sm_scale: Optional[float] = None,
    window_left: int = -1,
    logits_soft_cap: float = 0.0,
    return_lse: bool = False,
    backend: str = "auto",
    variant: Optional[AttentionVariant] = None,
    variant_params: Any = None,
):
    """Single-request decode: q is one token [num_qo_heads, head_dim]
    (reference flashinfer/decode.py:350-580). Decode is causal by
    construction (the single query is the last token)."""
    out = single_prefill_with_kv_cache(
        q[None],
        k,
        v,
        causal=False,  # single token at seq end sees the whole kv
        kv_layout=kv_layout,
        pos_encoding_mode=pos_encoding_mode,
        sm_scale=sm_scale,
        window_left=window_left,
        logits_soft_cap=logits_soft_cap,
        return_lse=return_lse,
        backend=backend,
        variant=variant,
        variant_params=variant_params,
    )
    if return_lse:
        o, lse = out
        return o[0], lse[0]
    return out[0]
