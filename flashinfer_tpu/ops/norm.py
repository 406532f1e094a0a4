"""RMS normalization ops.

Reference parity: flashinfer/norm.py:43-251 (`rmsnorm`, `fused_add_rmsnorm`,
`gemma_rmsnorm`, `gemma_fused_add_rmsnorm`), kernels include/flashinfer/norm.cuh.

TPU-first note: RMSNorm is memory-bound elementwise math. On GPU the
reference hand-writes kernels because torch would materialize temporaries;
under XLA the jnp formulation *fuses into the surrounding computation*
(e.g. into the preceding matmul's epilogue), which is strictly better than
an opaque kernel boundary — so the jnp path is the production path, and a
Pallas kernel is provided only for standalone benchmarking comparisons.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashinfer_tpu.utils import default_interpret, round_up

__all__ = [
    "rmsnorm",
    "fused_add_rmsnorm",
    "gemma_rmsnorm",
    "gemma_fused_add_rmsnorm",
    "rmsnorm_pallas",
]


def _rms(x: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return x32 * jax.lax.rsqrt(var + eps)


def rmsnorm(
    x: jax.Array, weight: jax.Array, eps: float = 1e-6, *, weight_bias: float = 0.0
) -> jax.Array:
    """out = x / rms(x) * (weight + weight_bias) (reference norm.py:43).

    x: [..., hidden]; weight: [hidden]."""
    w = weight.astype(jnp.float32) + weight_bias
    return (_rms(x, eps) * w).astype(x.dtype)


def fused_add_rmsnorm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    *,
    weight_bias: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """residual' = x + residual; out = rmsnorm(residual') (reference
    norm.py:100 fused_add_rmsnorm; functional: returns (out, residual')).
    """
    new_residual = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
        x.dtype
    )
    return rmsnorm(new_residual, weight, eps, weight_bias=weight_bias), new_residual


def gemma_rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma convention: scale by (1 + weight) (reference norm.py:166)."""
    return rmsnorm(x, weight, eps, weight_bias=1.0)


def gemma_fused_add_rmsnorm(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
) -> Tuple[jax.Array, jax.Array]:
    """(reference norm.py:210)."""
    return fused_add_rmsnorm(x, residual, weight, eps, weight_bias=1.0)


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float, weight_bias: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    w = w_ref[:].astype(jnp.float32) + weight_bias
    o_ref[:] = (x * jax.lax.rsqrt(var + eps) * w).astype(o_ref.dtype)


def rmsnorm_pallas(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    *,
    weight_bias: float = 0.0,
    block_rows: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Standalone Pallas RMSNorm (row-blocked); used for kernel-vs-XLA
    benchmarking. Requires 2D input [rows, hidden]."""
    if interpret is None:
        interpret = default_interpret()
    rows, hidden = x.shape
    rows_pad = round_up(rows, block_rows) if rows > block_rows else rows
    if rows_pad != rows:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
    blk = min(block_rows, rows_pad)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps, weight_bias=weight_bias),
        grid=(rows_pad // blk,),
        in_specs=[
            pl.BlockSpec((blk, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, hidden), x.dtype),
        interpret=interpret,
    )(x, weight.reshape(1, hidden))
    return out[:rows]
