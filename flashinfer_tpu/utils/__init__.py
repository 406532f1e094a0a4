"""Core utilities: dtype/layout canonicalization, rounding, enums.

TPU-native analogue of the reference's ``flashinfer/utils.py`` (dtype
canonicalization utils.py:40-120, kv-layout checks utils.py:150-220,
MaskMode/PosEncodingMode enums). torch-free: everything is JAX/NumPy.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MaskMode",
    "PosEncodingMode",
    "TensorLayout",
    "cdiv",
    "round_up",
    "round_down",
    "next_power_of_2",
    "canonicalize_dtype",
    "is_float8",
    "get_compute_dtype",
    "check_kv_layout",
    "expand_gqa",
    "on_tpu",
    "default_interpret",
    "LAST_DIM_LANES",
    "sublane_multiple",
    "pad_to",
    "get_sliding_window_mask",
    "apply_logits_soft_cap",
]

LAST_DIM_LANES = 128  # TPU lane width; last-dim tiles are always 128 wide.


class MaskMode(enum.IntEnum):
    """Mirrors the reference's mask modes (include/flashinfer/attention/mask.cuh)."""

    NON_CAUSAL = 0
    CAUSAL = 1
    CUSTOM = 2
    MULTIITEMSCORING = 3


class PosEncodingMode(enum.IntEnum):
    """Positional encoding applied inside the attention kernel
    (reference: include/flashinfer/pos_enc.cuh PosEncodingMode)."""

    NONE = 0
    ROPE_LLAMA = 1
    ALIBI = 2


class TensorLayout(enum.IntEnum):
    """KV-cache layout. NHD = [..., seq, heads, dim]; HND = [..., heads, seq, dim].
    (reference: flashinfer/utils.py TensorLayout)."""

    NHD = 0
    HND = 1


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def round_down(x: int, m: int) -> int:
    return (x // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (int(x) - 1).bit_length()


def canonicalize_dtype(dtype: Any) -> jnp.dtype:
    return jnp.dtype(dtype)


_F8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


def is_float8(dtype: Any) -> bool:
    dtype = jnp.dtype(dtype)
    return any(dtype == jnp.dtype(d) for d in _F8_DTYPES)


def get_compute_dtype(dtype: Any) -> jnp.dtype:
    """Dtype attention math runs in. FP8 inputs are dequantized to bf16 tiles
    before hitting the MXU (TPU MXU has no fp8 mode on v5)."""
    dtype = jnp.dtype(dtype)
    if is_float8(dtype) or dtype == jnp.dtype(jnp.bfloat16):
        return jnp.dtype(jnp.bfloat16)
    return jnp.dtype(jnp.float32)


def check_kv_layout(layout: str | TensorLayout) -> TensorLayout:
    if isinstance(layout, TensorLayout):
        return layout
    layout = layout.upper()
    if layout not in ("NHD", "HND"):
        raise KeyError(f"Invalid kv_layout {layout!r}; must be 'NHD' or 'HND'")
    return TensorLayout[layout]


def expand_gqa(kv: jax.Array, num_qo_heads: int, head_axis: int = -2) -> jax.Array:
    """Repeat KV heads to match query heads (reference oracle pattern)."""
    num_kv_heads = kv.shape[head_axis]
    if num_kv_heads == num_qo_heads:
        return kv
    assert num_qo_heads % num_kv_heads == 0
    return jnp.repeat(kv, num_qo_heads // num_kv_heads, axis=head_axis)


@functools.cache
def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def default_interpret() -> bool:
    """Pallas kernels run interpreted on non-TPU backends (CPU CI)."""
    return not on_tpu()


def sublane_multiple(dtype: Any) -> int:
    """Minimum second-to-last-dim tile for a dtype (pallas tiling constraint)."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize == 4:
        return 8
    if dtype.itemsize == 2:
        return 16
    return 32


def pad_to(x: jax.Array, size: int, axis: int, value=0) -> jax.Array:
    cur = x.shape[axis]
    if cur == size:
        return x
    assert cur < size, (cur, size)
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - cur)
    return jnp.pad(x, pads, constant_values=value)


def get_sliding_window_mask(
    qo_len: int, kv_len: int, window_left: int
) -> jax.Array:
    """Boolean [qo_len, kv_len] mask for a left sliding window (True = keep).

    Matches reference semantics (prefill.cuh window_left): token at query
    position i (absolute position kv_len - qo_len + i) attends to kv position
    j iff  kv_pos > q_abs_pos - window_left - 1.
    """
    q_pos = jnp.arange(qo_len)[:, None] + (kv_len - qo_len)
    kv_pos = jnp.arange(kv_len)[None, :]
    if window_left < 0:
        return jnp.ones((qo_len, kv_len), dtype=bool)
    return kv_pos > q_pos - window_left - 1


def apply_logits_soft_cap(logits: jax.Array, soft_cap: float) -> jax.Array:
    """tanh soft-capping (reference: variants.cuh LogitsSoftCap)."""
    if soft_cap <= 0.0:
        return logits
    return soft_cap * jnp.tanh(logits / soft_cap)
