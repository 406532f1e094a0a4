"""Gated activation ops.

Reference parity: flashinfer/activation.py:101-255 (`silu_and_mul`,
`gelu_and_mul`, `gelu_tanh_and_mul`), kernels include/flashinfer/activation.cuh.

Same TPU-first rationale as norm.py: these are elementwise and XLA fuses
them into the producing GEMM's epilogue; jnp IS the fast path. Input
convention matches the reference: x = [..., 2*d] where the first half is the
gate input and the second half the up-projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "silu_and_mul",
    "gelu_and_mul",
    "gelu_tanh_and_mul",
    "silu_and_mul_nvfp4_batched_quantize",
]


def _split(x: jax.Array):
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


def silu_and_mul(x: jax.Array, *, enable_pdl: bool = None) -> jax.Array:
    """out = silu(x[..., :d]) * x[..., d:] (reference activation.py:101).
    ``enable_pdl`` accepted for API parity; PDL is a CUDA-launch concept
    with no TPU analogue."""
    gate, up = _split(x)
    g32 = gate.astype(jnp.float32)
    return (g32 * jax.nn.sigmoid(g32) * up.astype(jnp.float32)).astype(x.dtype)


def gelu_and_mul(x: jax.Array, *, enable_pdl: bool = None) -> jax.Array:
    """Exact (erf) GeLU gate (reference activation.py:155)."""
    gate, up = _split(x)
    g = jax.nn.gelu(gate.astype(jnp.float32), approximate=False)
    return (g * up.astype(jnp.float32)).astype(x.dtype)


def gelu_tanh_and_mul(x: jax.Array, *, enable_pdl: bool = None) -> jax.Array:
    """tanh-approximated GeLU gate (reference activation.py:205)."""
    gate, up = _split(x)
    g = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
    return (g * up.astype(jnp.float32)).astype(x.dtype)


def silu_and_mul_nvfp4_batched_quantize(
    a: "jax.Array",  # [B, M, 2*K] gate||up
    mask: "jax.Array",  # [B, M] (or broadcastable) rows to keep
    a_global_sf: "jax.Array",  # [1] f32
    sf_vec_size: int = 16,
):
    """Fused SiLU-and-mul + NVFP4 batched quantize with row mask (reference
    activation.py:145 silu_and_mul_nvfp4_batched_quantize; kernel
    csrc/nv_internal quantization). On TPU the fusion is one traced
    expression — XLA fuses the activation, masking, scaling, and e2m1 pack
    into a single pass. Returns (packed e2m1 [B, M, K/2], scales
    [B, M, K/sf_vec_size])."""
    import jax.numpy as jnp

    from flashinfer_tpu.ops.fp4 import fp4_quantize

    act = silu_and_mul(a)
    mask = jnp.asarray(mask)
    if mask.ndim == act.ndim - 1:
        mask = mask[..., None]
    act = jnp.where(mask != 0, act, 0)
    return fp4_quantize(
        act, jnp.asarray(a_global_sf, jnp.float32).reshape(()),
        sf_vec_size=sf_vec_size,
    )
