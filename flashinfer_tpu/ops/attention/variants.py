"""Bring-your-own-attention-variant hooks, the TPU-native replacement for the
reference's Jinja + C++ functor JIT (include/flashinfer/attention/variant_helper.cuh:25-70,
flashinfer/jit/attention/variants.py).

On GPU the reference splices a user-supplied C++ struct into a template and
recompiles with nvcc. On TPU we exploit JAX tracing: a variant is a plain
Python object whose hooks are traced functions. The same hooks are inlined
into the pure-JAX oracle AND into Pallas kernel bodies, so a variant written
once runs everywhere and is compiled by XLA/Mosaic — no codegen, no nvcc.

Hook points mirror the reference macros:
  REGISTER_QUERY_TRANSFORM   -> query_transform(params, q)
  REGISTER_LOGITS_TRANSFORM  -> logits_transform(params, logits, q_pos, kv_pos)
  REGISTER_LOGITS_MASK       -> logits_mask(params, q_pos, kv_pos)
  REGISTER_M_D_UPDATE        -> sink contribution via `sink_logits(params)`
  REGISTER_OUTPUT_TRANSFORM  -> output_transform(params, out)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from flashinfer_tpu.utils import apply_logits_soft_cap

__all__ = [
    "AttentionVariant",
    "DefaultAttention",
    "FlashSigmoid",
    "make_default_variant",
]

Params = Any  # per-call auxiliary pytree (scales, custom masks, alibi slopes, ...)


@dataclasses.dataclass(frozen=True)
class AttentionVariant:
    """A set of traced hooks inlined into attention kernels.

    All hooks are optional; `None` means identity. Hooks must be pure,
    shape-preserving JAX functions (they are traced under jit/pallas).

    logits_transform / logits_mask receive broadcastable integer arrays
    ``q_pos`` (absolute query token position), ``kv_pos`` and ``head_idx``
    so variants can implement positional/per-head logic (ALiBi, windows,
    multi-item scoring). Inside a Pallas kernel tile these are the tile's
    position/head slices; in the oracle they span the whole problem — the
    same hook body works for both because everything is broadcast math.
    """

    name: str = "default"
    # q -> q  (applied once, before QK^T). Softmax scale is folded here.
    query_transform: Optional[Callable[[Params, jnp.ndarray], jnp.ndarray]] = None
    # (params, logits, q_pos, kv_pos, head_idx) -> logits
    logits_transform: Optional[Callable[..., jnp.ndarray]] = None
    # (params, q_pos, kv_pos, head_idx) -> bool array, True = keep
    logits_mask: Optional[Callable[..., jnp.ndarray]] = None
    # extra additive softmax-denominator logit per head (attention sinks);
    # returns [num_heads] logits or None
    sink_logits: Optional[Callable[[Params], jnp.ndarray]] = None
    # out -> out (after PV)
    output_transform: Optional[Callable[[Params, jnp.ndarray], jnp.ndarray]] = None
    # If True the kernel skips exp/softmax normalization entirely
    # (reference: FlashSigmoid-style variants run logits through the
    # transform and use them as weights directly).
    use_softmax: bool = True


def _alibi_bias(slopes, q_pos, kv_pos, head_idx):
    # slopes: [num_heads]; head_idx broadcastable to logits' head position
    return slopes[head_idx] * (kv_pos - q_pos).astype(jnp.float32)


def make_default_variant(
    *,
    logits_soft_cap: float = 0.0,
    use_alibi: bool = False,
    has_sink: bool = False,
) -> AttentionVariant:
    """The reference's ``DefaultAttention<custom_mask, sliding_window,
    soft_cap, alibi>`` (include/flashinfer/attention/variants.cuh:32) as a
    hook bundle. Sliding-window & custom-mask are handled by kernel mask
    plumbing, not hooks."""

    logits_transform = None
    if logits_soft_cap > 0.0 and use_alibi:

        def logits_transform(params, logits, q_pos, kv_pos, head_idx):
            logits = logits + _alibi_bias(
                params["alibi_slopes"], q_pos, kv_pos, head_idx
            )
            return apply_logits_soft_cap(logits, logits_soft_cap)

    elif logits_soft_cap > 0.0:

        def logits_transform(params, logits, q_pos, kv_pos, head_idx):
            return apply_logits_soft_cap(logits, logits_soft_cap)

    elif use_alibi:

        def logits_transform(params, logits, q_pos, kv_pos, head_idx):
            return logits + _alibi_bias(
                params["alibi_slopes"], q_pos, kv_pos, head_idx
            )

    sink = (lambda params: params["sink"]) if has_sink else None
    name = f"default(cap={logits_soft_cap},alibi={use_alibi},sink={has_sink})"
    return AttentionVariant(
        name=name, logits_transform=logits_transform, sink_logits=sink
    )


DefaultAttention = make_default_variant()


def FlashSigmoid(scale: float = 1.0, bias: float = 0.0) -> AttentionVariant:
    """Sigmoid attention (the reference's customization-test variant,
    tests/utils/test_jit_example.py): weights = sigmoid(scale*logits + bias),
    no softmax normalization."""

    def logits_transform(params, logits, q_pos, kv_pos, head_idx):
        return jnp.reciprocal(1.0 + jnp.exp(-(logits * scale + bias)))

    return AttentionVariant(
        name="flash_sigmoid", logits_transform=logits_transform, use_softmax=False
    )
