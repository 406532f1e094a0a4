"""Rotary position embedding ops.

Reference parity: flashinfer/rope.py:321-1154 — `apply_rope`,
`apply_rope_pos_ids`, `apply_llama31_rope`, `apply_llama31_rope_pos_ids`,
`apply_rope_with_cos_sin_cache`, and the inplace variants (functional here:
JAX returns new arrays; XLA turns them into in-place updates under donation).
Kernels: include/flashinfer/pos_enc.cuh (BatchQKApplyRotaryKernel et al.).

TPU-first: RoPE is bandwidth-bound elementwise math over [nnz, heads, dim];
the jnp formulation fuses into adjacent ops under jit (e.g. the QKV
projection), which beats a standalone kernel. The rotary frequency tables
are computed inline and constant-folded by XLA.

Conventions (matching the reference):
  * interleave=False (default): rotate-half pairs (x[i], x[i + d/2])
    (GPT-NeoX style). interleave=True: adjacent pairs (x[2i], x[2i+1])
    (GPT-J style).
  * rope_scale divides positions (linear scaling); rope_theta is the base.
  * Llama-3.1 variant rescales per-frequency wavelengths with
    low/high-freq factors (reference rope.py:likely apply_llama31_rope
    defaults: factor=8, low=1, high=4, old_context_len=8192).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "apply_rope",
    "apply_rope_pos_ids",
    "apply_llama31_rope",
    "apply_llama31_rope_pos_ids",
    "apply_rope_with_cos_sin_cache",
    "mla_rope_quantize_fp8",
    "rope_cos_sin_cache",
]


def _rope_inv_freq(rotary_dim: int, rope_theta: float) -> jax.Array:
    return 1.0 / (
        rope_theta
        ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )


def _llama31_rescale(
    inv_freq: jax.Array,
    factor: float,
    low_freq_factor: float,
    high_freq_factor: float,
    old_context_len: int,
) -> jax.Array:
    """Llama-3.1 frequency-dependent scaling (reference rope.py llama31
    variants; matches the huggingface rope_scaling 'llama3' rule)."""
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2.0 * jnp.pi / inv_freq
    # high-frequency (short wavelength): unchanged; low-frequency: /factor;
    # in between: smooth interpolation.
    smooth = (old_context_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    interp = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = jnp.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return jnp.where(mid, interp, out)


def _apply(
    x: jax.Array,  # [nnz, heads, head_dim]
    cos: jax.Array,  # [nnz, rotary_dim/2]
    sin: jax.Array,
    rotary_dim: int,
    interleave: bool,
) -> jax.Array:
    orig_dtype = x.dtype
    xr = x[..., :rotary_dim].astype(jnp.float32)
    rest = x[..., rotary_dim:]
    cos = cos[:, None, :]  # broadcast over heads
    sin = sin[:, None, :]
    if interleave:
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        rot = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
    else:
        half = rotary_dim // 2
        x1 = xr[..., :half]
        x2 = xr[..., half:]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        rot = jnp.concatenate([r1, r2], axis=-1)
    return jnp.concatenate([rot.astype(orig_dtype), rest], axis=-1)


def _cos_sin_from_pos(
    pos_ids: jax.Array, inv_freq: jax.Array, rope_scale: float
) -> Tuple[jax.Array, jax.Array]:
    angles = (pos_ids.astype(jnp.float32) / rope_scale)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_pos_ids(
    q: jax.Array,
    k: jax.Array,
    pos_ids: jax.Array,
    *,
    rotary_dim: Optional[int] = None,
    interleave: bool = False,
    rope_scale: float = 1.0,
    rope_theta: float = 1e4,
) -> Tuple[jax.Array, jax.Array]:
    """RoPE with explicit positions (reference rope.py apply_rope_pos_ids).

    q: [nnz, num_qo_heads, head_dim], k: [nnz, num_kv_heads, head_dim],
    pos_ids: [nnz] int32.
    """
    rotary_dim = rotary_dim or q.shape[-1]
    inv_freq = _rope_inv_freq(rotary_dim, rope_theta)
    cos, sin = _cos_sin_from_pos(pos_ids, inv_freq, rope_scale)
    return (
        _apply(q, cos, sin, rotary_dim, interleave),
        _apply(k, cos, sin, rotary_dim, interleave),
    )


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    indptr: jax.Array,
    offsets: jax.Array,
    *,
    rotary_dim: Optional[int] = None,
    interleave: bool = False,
    rope_scale: float = 1.0,
    rope_theta: float = 1e4,
) -> Tuple[jax.Array, jax.Array]:
    """Ragged-batch RoPE (reference rope.py apply_rope): token i of request b
    (rows indptr[b]:indptr[b+1]) gets position offsets[b] + (i - indptr[b])."""
    nnz = q.shape[0]
    token = jnp.arange(nnz, dtype=jnp.int32)
    b = jnp.searchsorted(indptr, token, side="right").astype(jnp.int32) - 1
    pos_ids = offsets[b] + token - indptr[b]
    return apply_rope_pos_ids(
        q, k, pos_ids,
        rotary_dim=rotary_dim, interleave=interleave,
        rope_scale=rope_scale, rope_theta=rope_theta,
    )


def apply_llama31_rope_pos_ids(
    q: jax.Array,
    k: jax.Array,
    pos_ids: jax.Array,
    *,
    rotary_dim: Optional[int] = None,
    interleave: bool = False,
    rope_scale: float = 8.0,
    rope_theta: float = 5e5,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Llama-3.1-scaled RoPE (reference rope.py apply_llama31_rope_pos_ids)."""
    rotary_dim = rotary_dim or q.shape[-1]
    inv_freq = _rope_inv_freq(rotary_dim, rope_theta)
    inv_freq = _llama31_rescale(
        inv_freq, rope_scale, low_freq_factor, high_freq_factor, old_context_len
    )
    cos, sin = _cos_sin_from_pos(pos_ids, inv_freq, 1.0)
    return (
        _apply(q, cos, sin, rotary_dim, interleave),
        _apply(k, cos, sin, rotary_dim, interleave),
    )


def apply_llama31_rope(
    q: jax.Array,
    k: jax.Array,
    indptr: jax.Array,
    offsets: jax.Array,
    **kwargs,
) -> Tuple[jax.Array, jax.Array]:
    nnz = q.shape[0]
    token = jnp.arange(nnz, dtype=jnp.int32)
    b = jnp.searchsorted(indptr, token, side="right").astype(jnp.int32) - 1
    pos_ids = offsets[b] + token - indptr[b]
    return apply_llama31_rope_pos_ids(q, k, pos_ids, **kwargs)


def rope_cos_sin_cache(
    max_position: int,
    rotary_dim: int,
    *,
    rope_theta: float = 1e4,
    rope_scale: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Precomputed [max_position, rotary_dim] cache, first half cos, second
    half sin — the layout apply_rope_with_cos_sin_cache expects (matches the
    reference's vLLM-compatible cos_sin_cache)."""
    inv_freq = _rope_inv_freq(rotary_dim, rope_theta)
    pos = jnp.arange(max_position, dtype=jnp.float32) / rope_scale
    angles = pos[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1).astype(dtype)


def apply_rope_with_cos_sin_cache(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array,
    head_size: int,
    cos_sin_cache: jax.Array,
    is_neox: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """vLLM-layout RoPE (reference rope.py apply_rope_with_cos_sin_cache):
    query/key are [nnz, num_heads*head_size] flattened; cos_sin_cache
    [max_pos, rotary_dim] with cos||sin halves. is_neox=True → rotate-half.
    """
    nnz = query.shape[0]
    rotary_dim = cos_sin_cache.shape[-1]
    half = rotary_dim // 2
    cs = cos_sin_cache[positions].astype(jnp.float32)
    cos, sin = cs[:, :half], cs[:, half:]
    q = query.reshape(nnz, -1, head_size)
    k = key.reshape(nnz, -1, head_size)
    q = _apply(q, cos, sin, rotary_dim, interleave=not is_neox)
    k = _apply(k, cos, sin, rotary_dim, interleave=not is_neox)
    return q.reshape(query.shape), k.reshape(key.shape)


def mla_rope_quantize_fp8(
    q_rope: jax.Array,  # [nnz, num_heads, rope_dim]
    k_rope: jax.Array,  # [nnz, rope_dim]
    q_nope: jax.Array,  # [nnz, num_heads, nope_dim]
    k_nope: jax.Array,  # [nnz, nope_dim]
    cos_sin_cache: jax.Array,  # [max_pos, rope_dim] f32, cos||sin halves
    pos_ids: jax.Array,
    is_neox: bool = True,
    quantize_dtype=jnp.float8_e4m3fn,
    quant_scale_q: float = 1.0,
    quant_scale_kv: float = 1.0,
    quantize_q: bool = True,
    **_out_compat,  # *_out preallocated-output args accepted for parity
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused MLA RoPE + FP8 quantization (reference rope.py:1154
    mla_rope_quantize_fp8 / csrc/rope.cu): apply the cos-sin-cache rotary
    embedding to the rope parts of the MLA query/key and quantize the
    pieces to e4m3 in one pass — the critical prologue of the FP8 MLA path
    (config 4 + fp8).

    On TPU the fusion is one traced expression; XLA fuses the rotate,
    scale, and convert into a single elementwise pass over each operand.
    TPU-specific extensions:
      * quantize_dtype=jnp.int8 emits e4m3 BITS in an int8 container —
        the layout the Pallas MLA kernel consumes directly (pre-v6 TPUs
        have no hardware fp8; see ops/fp8.py).
      * quantize_q=False keeps the q pieces in their input dtype (roped but
        unquantized): the TPU kernel's MXU takes bf16 q against the
        bit-decoded cache, so quantizing q would only add decode work.
    Returns (q_rope, k_rope_fp8, q_nope, k_nope_fp8).
    """
    assert cos_sin_cache.dtype == jnp.float32, "cos_sin_cache must be f32"
    rotary_dim = cos_sin_cache.shape[-1]
    half = rotary_dim // 2
    cs = cos_sin_cache[pos_ids].astype(jnp.float32)
    cos, sin = cs[:, :half], cs[:, half:]
    qr = _apply(q_rope, cos, sin, rotary_dim, interleave=not is_neox)
    kr = _apply(k_rope[:, None, :], cos, sin, rotary_dim,
                interleave=not is_neox)[:, 0]

    def quant(x, scale):
        y = x.astype(jnp.float32) * scale
        if quantize_dtype == jnp.int8:
            return jax.lax.bitcast_convert_type(
                y.astype(jnp.float8_e4m3fn), jnp.int8
            )
        return y.astype(quantize_dtype)

    return (
        quant(qr, quant_scale_q) if quantize_q else qr.astype(q_rope.dtype),
        quant(kr, quant_scale_kv),
        quant(q_nope, quant_scale_q) if quantize_q else q_nope,
        quant(k_nope, quant_scale_kv),
    )
