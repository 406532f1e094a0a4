"""Bit-packing ops for compressed custom attention masks.

Reference parity: flashinfer/quantization.py:57 `packbits`, :91
`segment_packbits`; kernels include/flashinfer/quantization.cuh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from flashinfer_tpu.utils import cdiv

__all__ = ["packbits", "segment_packbits", "unpackbits"]


def packbits(x: jax.Array, bitorder: str = "big") -> jax.Array:
    """Pack a boolean/int vector into uint8, 8 entries per byte
    (reference quantization.py:57)."""
    n = x.shape[0]
    pad = (-n) % 8
    xb = jnp.pad(x.astype(jnp.uint8) & 1, (0, pad)).reshape(-1, 8)
    if bitorder == "big":
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    elif bitorder == "little":
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    else:
        raise ValueError(f"bitorder must be 'big'/'little', got {bitorder!r}")
    return (xb * weights[None, :]).sum(-1).astype(jnp.uint8)


def unpackbits(x: jax.Array, n: int, bitorder: str = "big") -> jax.Array:
    """Inverse of packbits, returning the first ``n`` bits as bool."""
    shifts = jnp.arange(7, -1, -1, jnp.uint8) if bitorder == "big" else jnp.arange(8, dtype=jnp.uint8)
    bits = (x[:, None] >> shifts[None, :]) & 1
    return bits.reshape(-1)[:n].astype(bool)


def segment_packbits(
    x: jax.Array, indptr: jax.Array, bitorder: str = "big"
) -> Tuple[jax.Array, jax.Array]:
    """Pack each CSR segment independently so every segment starts on a byte
    boundary (reference quantization.py:91). Returns (packed, new_indptr).

    Note: segment boundaries are data-dependent; this op is host-facing
    (mask preparation happens at plan time, off the jit hot path), so we
    compute with NumPy-compatible jnp on concrete arrays.
    """
    import numpy as np

    x_np = np.asarray(x)
    indptr_np = np.asarray(indptr)
    batch = len(indptr_np) - 1
    seg_nnz = indptr_np[1:] - indptr_np[:-1]
    packed_lens = -(-seg_nnz // 8)
    new_indptr = np.concatenate([[0], np.cumsum(packed_lens)]).astype(indptr_np.dtype)
    out = np.zeros(int(new_indptr[-1]), np.uint8)
    for b in range(batch):
        seg = x_np[indptr_np[b] : indptr_np[b + 1]].astype(np.uint8) & 1
        out[new_indptr[b] : new_indptr[b + 1]] = np.packbits(
            seg, bitorder=bitorder
        )
    return jnp.asarray(out), jnp.asarray(new_indptr)
