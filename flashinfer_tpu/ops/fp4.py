"""FP4 (e2m1) quantization ops.

Reference parity: flashinfer/fp4_quantization.py (862 LoC) — ``fp4_quantize``,
``nvfp4_quantize``, ``mxfp4_quantize``, ``mxfp4_dequantize_host``,
``block_scale_interleave``, ``shuffle_matrix_a``, ``SfLayout``.

Formats:
  * nvfp4: e2m1 values, e4m3 block scales per 16 elements + one global f32.
  * mxfp4: e2m1 values, e8m0 (power-of-two) block scales per 32 elements.

TPU re-design: values are stored two-per-byte (uint8, low nibble first).
The reference's swizzled scale layouts (SfLayout 128x4, shuffle_matrix_*)
exist to feed Blackwell tensor-core ldmatrix patterns; TPU has no analogue,
so scales are row-major and the layout helpers are identity/compat shims.
Dequant is jnp (gathers from a 16-entry LUT) so XLA fuses it into the
consuming matmul — on v5 the MXU has no native fp4 mode.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "SfLayout",
    "fp4_quantize",
    "fp4_dequantize",
    "nvfp4_quantize",
    "mxfp4_quantize",
    "mxfp4_dequantize",
    "block_scale_interleave",
    "shuffle_matrix_a",
    "shuffle_matrix_sf_a",
    "e2m1_to_float",
]

# e2m1 code points 0..7 (sign bit separate): 0, .5, 1, 1.5, 2, 3, 4, 6
_E2M1_VALUES = jnp.asarray(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.0, -0.5, -1.0, -1.5, -2.0,
     -3.0, -4.0, -6.0],
    jnp.float32,
)
_E2M1_MAX = 6.0
_E4M3_MAX = 448.0


class SfLayout(enum.IntEnum):
    """Scale-factor layout (reference fp4_quantization.py SfLayout). On TPU
    both map to row-major storage; the enum is kept for API parity."""

    layout_128x4 = 0
    layout_8x4 = 1
    layout_linear = 2


def _quantize_e2m1(x: jax.Array) -> jax.Array:
    """Round-to-nearest-even onto the e2m1 grid; returns uint8 codes 0..15."""
    sign = (x < 0).astype(jnp.uint8)
    mag = jnp.abs(x)
    # midpoints between consecutive e2m1 magnitudes
    bounds = jnp.asarray([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0], jnp.float32)
    code = jnp.sum(
        (mag[..., None] > bounds).astype(jnp.uint8), axis=-1
    ).astype(jnp.uint8)
    return code | (sign << 3)


def _pack_nibbles(codes: jax.Array) -> jax.Array:
    """[..., k] uint8 codes -> [..., k/2] packed (low nibble = even index)."""
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    lo = packed & 0xF
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def e2m1_to_float(codes: jax.Array) -> jax.Array:
    return _E2M1_VALUES[codes.astype(jnp.int32)]


def fp4_quantize(
    x: jax.Array,
    global_scale: Optional[jax.Array] = None,
    sf_vec_size: int = 16,
    sf_use_ue8m0: bool = False,
    is_sf_swizzled_layout: bool = True,  # accepted for parity; row-major here
) -> Tuple[jax.Array, jax.Array]:
    """Quantize [..., k] to packed e2m1 + block scales (reference
    fp4_quantize, fp4_quantization.py). Returns (packed uint8 [..., k/2],
    scales: e4m3-as-uint8 when sf_use_ue8m0=False else e8m0-as-uint8,
    shape [..., k/sf_vec_size])."""
    *lead, k = x.shape
    assert k % sf_vec_size == 0
    if global_scale is None:
        global_scale = jnp.asarray(1.0, jnp.float32)
    xb = x.astype(jnp.float32).reshape(*lead, k // sf_vec_size, sf_vec_size)
    amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
    if sf_use_ue8m0:
        exp = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / _E2M1_MAX)), -127, 127
        )
        scale = jnp.exp2(exp)
        sf = (exp[..., 0] + 127).astype(jnp.uint8)
    else:
        # nvfp4: e4m3 block scale times global scale
        scale_f = jnp.maximum(amax, 1e-30) / _E2M1_MAX * global_scale
        sf_e4m3 = scale_f.astype(jnp.float8_e4m3fn)
        scale = sf_e4m3.astype(jnp.float32) / global_scale
        scale = jnp.where(scale > 0, scale, 1.0)
        sf = jax.lax.bitcast_convert_type(sf_e4m3[..., 0], jnp.uint8)
    codes = _quantize_e2m1(xb / scale)
    return _pack_nibbles(codes.reshape(*lead, k)), sf


def fp4_dequantize(
    packed: jax.Array,
    scales: jax.Array,
    sf_vec_size: int = 16,
    sf_use_ue8m0: bool = False,
    global_scale: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    codes = _unpack_nibbles(packed)
    vals = e2m1_to_float(codes)
    *lead, k = vals.shape
    vb = vals.reshape(*lead, k // sf_vec_size, sf_vec_size)
    if sf_use_ue8m0:
        scale = jnp.exp2(scales.astype(jnp.float32) - 127.0)
    else:
        scale = jax.lax.bitcast_convert_type(
            scales, jnp.float8_e4m3fn
        ).astype(jnp.float32)
        if global_scale is not None:
            scale = scale / global_scale
    return (vb * scale[..., None]).reshape(*lead, k).astype(dtype)


def nvfp4_quantize(
    x: jax.Array, global_scale: Optional[jax.Array] = None,
    sfLayout: SfLayout = SfLayout.layout_128x4, do_shuffle: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(reference fp4_quantization.py nvfp4_quantize)."""
    return fp4_quantize(x, global_scale, sf_vec_size=16, sf_use_ue8m0=False)


def mxfp4_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(reference fp4_quantization.py mxfp4_quantize)."""
    return fp4_quantize(x, None, sf_vec_size=32, sf_use_ue8m0=True)


def mxfp4_dequantize(packed: jax.Array, scales: jax.Array) -> jax.Array:
    return fp4_dequantize(packed, scales, sf_vec_size=32, sf_use_ue8m0=True)


def block_scale_interleave(sf: jax.Array) -> jax.Array:
    """Identity on TPU (reference block_scale_interleave swizzles for
    Blackwell's scale-factor banks; TPU scales are row-major)."""
    return sf


def shuffle_matrix_a(x: jax.Array, epilogue_tile_m: int = 128) -> jax.Array:
    """Identity on TPU (reference shuffle_matrix_a reorders rows for the
    trtllm-gen epilogue)."""
    return x


def shuffle_matrix_sf_a(sf: jax.Array, epilogue_tile_m: int = 128) -> jax.Array:
    return sf
