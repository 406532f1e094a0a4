"""Pallas grouped (per-expert) GEMM with in-kernel FP8 dequantization.

Reference parity: the CUTLASS grouped-GEMM backend of the fused-MoE stack —
csrc/fused_moe/cutlass_backend/cutlass_fused_moe_kernels.cuh (the mainloop
dequantizes quantized expert weights on the way into the tensor cores) and
csrc/nv_internal/.../moe_gemm_template_dispatch.h. The reference never
materializes a dequantized weight copy; neither does this kernel.

TPU-first design (vs ``lax.ragged_dot``):

* **Tile-aligned group layout.** ``lax.ragged_dot`` handles arbitrary group
  boundaries but pays for it with misaligned MXU tiles (~35-45% of peak,
  docs/PERF.md). Here the caller scatters tokens into a padded layout where
  every expert's segment starts on a ``tm``-row tile boundary
  (:func:`make_group_layout`) — each m-tile then belongs to exactly ONE
  expert and the kernel is a plain dense GEMM with a scalar-prefetched
  tile→expert map. Padding costs ≤ ``num_experts × tm`` zero rows (dropped
  by the gather on the way out); alignment buys full-size MXU tiles.
* **Native NT weight layout, zero transpose.** rhs is consumed as
  ``[E, K, N]`` — the layout the second GEMM operand naturally wants — so
  no per-call transposed weight copy is materialized (the old ragged_dot
  path's ``swapaxes`` materialized one every call).
* **In-kernel e4m3 bit decode.** fp8 weights ship as e4m3 BITS in int8
  containers (pre-v6 TPUs have no hardware fp8; the float8 dtype path is
  ~8x slower than int8 streaming — see ops/fp8.py). The packed decode
  (kernels/paged.py ``_e4m3_decode_rows``: 9 int32 ops per 4 elements)
  yields even/odd row halves of the K axis at 2^-120 scale; the kernel
  contracts each half against the matching half of a K-permuted lhs, so the
  permutation never reaches the output. The lhs K-permutation is STATIC
  (:func:`fp8_k_permutation`) and folds into the gather that builds the
  padded layout — zero extra memory traffic. Scale recovery: lhs is
  multiplied by 2^60 in-kernel (products land at 2^-60, safely f32-normal)
  and the finalize multiplies 2^60 × per-expert dequant scale back in.

Used by :func:`flashinfer_tpu.ops.fused_moe.fused_moe` for both GEMMs of the
expert MLP; composes with EP sharding (parallel/moe.py) unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashinfer_tpu.utils import default_interpret

__all__ = [
    "GroupLayout",
    "make_group_layout",
    "fp8_k_permutation",
    "grouped_gemm_padded",
    "grouped_gemm",
]

_E4M3_EXP_SHIFT = 60
_E4M3_SHIFT_SCALE = 2.0**_E4M3_EXP_SHIFT
_VMEM_BUDGET = 10 * 1024 * 1024
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class GroupLayout:
    """Tile-aligned padded token layout for a grouped GEMM.

    ``m_pad`` is STATIC (``round_up(num_rows, tm) + num_groups * tm`` upper
    bound) so one compiled program serves every routing outcome — the same
    CUDA-graph-stability property the rest of the library keeps.
    """

    tm: int
    m_pad: int
    num_rows: int
    # [m_pad // tm] int32: owning expert per m-tile; -1 beyond the used
    # region (those tiles compute on zero rows and are never gathered back)
    expert_of_tile: jax.Array
    # [m_pad] int32 / bool: source row (in group-sorted order) feeding each
    # padded row, and whether that padded row is real (vs alignment padding)
    src_row: jax.Array
    src_valid: jax.Array
    # [num_rows] int32: padded destination of each group-sorted row
    padded_pos: jax.Array


def make_group_layout(
    group_sizes: jax.Array,  # [E] int32 (traced — no host sync)
    num_rows: int,
    tm: int,
) -> GroupLayout:
    """Compute the padded layout for rows sorted by group (stable sort by
    expert, as produced by ``_permute_by_expert``). All outputs are traced
    arrays; ``m_pad`` alone is static."""
    e = group_sizes.shape[0]
    gs = group_sizes.astype(jnp.int32)
    padded = ((gs + tm - 1) // tm) * tm
    pcum = jnp.cumsum(padded).astype(jnp.int32)
    pstart = jnp.concatenate([jnp.zeros(1, jnp.int32), pcum[:-1]])
    cum = jnp.cumsum(gs).astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32), cum[:-1]])
    used = pcum[-1]

    m_pad = _round_up(num_rows, tm) + e * tm  # static bound on used
    mt = m_pad // tm

    tile0 = jnp.arange(mt, dtype=jnp.int32) * tm
    eot = jnp.searchsorted(pcum, tile0, side="right").astype(jnp.int32)
    eot = jnp.where(tile0 < used, eot, -1)

    rows = jnp.arange(m_pad, dtype=jnp.int32)
    er = jnp.minimum(
        jnp.searchsorted(pcum, rows, side="right").astype(jnp.int32), e - 1
    )
    off = rows - pstart[er]
    src_valid = (rows < used) & (off < gs[er])
    src_row = jnp.where(src_valid, start[er] + off, 0)

    srows = jnp.arange(num_rows, dtype=jnp.int32)
    sg = jnp.minimum(
        jnp.searchsorted(cum, srows, side="right").astype(jnp.int32), e - 1
    )
    padded_pos = pstart[sg] + (srows - start[sg])

    return GroupLayout(
        tm=tm,
        m_pad=m_pad,
        num_rows=num_rows,
        expert_of_tile=eot,
        src_row=src_row,
        src_valid=src_valid,
        padded_pos=padded_pos,
    )


def fp8_k_permutation(k_dim: int, tk: int) -> np.ndarray:
    """STATIC lhs column permutation matching the kernel's e4m3 decode.

    The packed decode splits each ``[tk, tn]`` rhs tile into K-even and
    K-odd row halves. Pre-permuting lhs columns (within each tk block:
    evens, then odds) lets the kernel contract ``lhs[:, :tk/2] @ even +
    lhs[:, tk/2:] @ odd`` — the permutation cancels in the contraction and
    the output needs no fixup. Fold this into whatever gather/elementwise
    pass produces lhs (it is free there)."""
    assert k_dim % tk == 0 and tk % 4 == 0
    idx = np.arange(k_dim, dtype=np.int32).reshape(-1, tk)
    return np.concatenate([idx[:, 0::2], idx[:, 1::2]], axis=1).reshape(-1)


def _gg_kernel(
    em_ref,  # scalar prefetch: [MT] int32 tile -> expert (-1 = padding)
    sc_ref,  # scalar prefetch: [E] f32 per-expert dequant scale
    lhs_ref,  # [tm, tk] VMEM
    rhs_ref,  # [1, tk, tn] VMEM (bf16 or int8 e4m3 bits)
    out_ref,  # [tm, tn]
    acc_ref,  # [tm, tn] f32 scratch
    *,
    nk: int,
    fp8: bool,
    tk: int,
    out_dtype,
):
    m = pl.program_id(0)
    k = pl.program_id(2)
    e = em_ref[m]

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Padding tiles (e < 0) skip the MXU work; their lhs rows are zero so
    # acc stays zero and the unconditional finalize writes zeros.
    @pl.when(e >= 0)
    def _compute():
        dn = (((1,), (0,)), ((), ()))
        if fp8:
            # decode yields K-even/K-odd halves at 2^-120; lhs columns are
            # pre-permuted to match (fp8_k_permutation) and carry 2^60 so
            # products sit at 2^-60 — f32-normal. Finalize restores 2^60.
            ce, co = _e4m3_decode_rows(rhs_ref[0])
            lhs = lhs_ref[...] * lhs_ref.dtype.type(_E4M3_SHIFT_SCALE)
            half = tk // 2
            acc_ref[:] += jax.lax.dot_general(
                lhs[:, :half], ce, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                lhs[:, half:], co, dn, preferred_element_type=jnp.float32
            )
        else:
            acc_ref[:] += jax.lax.dot_general(
                lhs_ref[...], rhs_ref[0], dn,
                preferred_element_type=jnp.float32,
            )

    @pl.when(k == nk - 1)
    def _finalize():
        fix = _E4M3_SHIFT_SCALE if fp8 else 1.0
        scale = sc_ref[jnp.maximum(e, 0)] * jnp.float32(fix)
        out_ref[:] = (acc_ref[:] * scale).astype(out_dtype)


def _e4m3_decode_rows(x8):
    # import here to avoid a cycle (kernels/paged.py imports nothing from
    # this module, but ops/__init__ ordering is delicate)
    from flashinfer_tpu.ops.attention.kernels.paged import _e4m3_decode_rows

    return _e4m3_decode_rows(x8)


def _choose_tiles(
    m_pad: int, k_dim: int, n_dim: int, tm: int, fp8: bool,
    tn: Optional[int], tk: Optional[int],
) -> Tuple[int, int]:
    """Largest VMEM-legal (tn, tk) dividing (N, K). The VMEM model counts
    double-buffered lhs/rhs blocks, the f32 accumulator, and (fp8) the
    decoded bf16 halves."""

    def legal(tn_, tk_):
        if n_dim % tn_ or k_dim % tk_:
            return False
        if fp8 and tk_ % 4:
            return False
        rhs_item = 1 if fp8 else 2
        use = (
            2 * tm * tk_ * 2  # lhs double-buffered (bf16)
            + 2 * tk_ * tn_ * rhs_item  # rhs double-buffered
            + tm * tn_ * 4  # acc
            + tm * tn_ * 4  # out staging
            + (2 * tk_ * tn_ if fp8 else 0)  # decoded halves (bf16)
        )
        return use <= _VMEM_BUDGET

    if tn is not None and tk is not None:
        assert legal(tn, tk), (tn, tk, "tiles exceed VMEM or misdivide")
        return tn, tk
    best = None
    for tn_ in (1024, 512, 256, _LANES):
        for tk_ in (1024, 512, 256, _LANES):
            if legal(tn_, tk_):
                cand = (tn_, tk_)
                if best is None or cand[0] * cand[1] > best[0] * best[1]:
                    best = cand
    assert best is not None, (
        f"no legal grouped-GEMM tiles for K={k_dim} N={n_dim} "
        f"(need 128 | K and 128 | N)"
    )
    return best


def grouped_gemm_padded(
    lhs: jax.Array,  # [m_pad, K] bf16 (fp8: columns pre-permuted!)
    rhs: jax.Array,  # [E, K, N] bf16, or int8 e4m3 bits
    expert_of_tile: jax.Array,  # [m_pad // tm] int32
    scales: Optional[jax.Array] = None,  # [E] f32 per-expert dequant scale
    *,
    tn: Optional[int] = None,
    tk: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Dense-tiled grouped GEMM over a tile-aligned padded layout.

    ``out[p, :] = lhs[p, :] @ (rhs[e] * scales[e])`` for every padded row p
    owned by expert e. fp8 rhs dequantizes IN-KERNEL (no bf16 weight copy
    is ever materialized); callers must pre-permute lhs columns with
    :func:`fp8_k_permutation` (the permutation cancels in the kernel)."""
    if interpret is None:
        interpret = default_interpret()
    m_pad, k_dim = lhs.shape
    e, kr, n_dim = rhs.shape
    assert kr == k_dim, (kr, k_dim)
    mt = expert_of_tile.shape[0]
    assert m_pad % mt == 0
    tm = m_pad // mt
    fp8 = rhs.dtype == jnp.int8
    if not fp8:
        assert rhs.dtype == lhs.dtype, (rhs.dtype, lhs.dtype)
    out_dtype = out_dtype or lhs.dtype
    tn, tk = _choose_tiles(m_pad, k_dim, n_dim, tm, fp8, tn, tk)
    nk = k_dim // tk

    if scales is None:
        scales = jnp.ones((e,), jnp.float32)
    else:
        scales = jnp.broadcast_to(
            jnp.asarray(scales, jnp.float32).reshape(-1), (e,)
        )

    grid = (mt, n_dim // tn, nk)
    kernel = functools.partial(
        _gg_kernel, nk=nk, fp8=fp8, tk=tk, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), lambda m, n, k, em, sc: (m, k)),
                pl.BlockSpec(
                    (1, tk, tn),
                    lambda m, n, k, em, sc: (jnp.maximum(em[m], 0), k, n),
                ),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda m, n, k, em, sc: (m, n)),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_dim), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_dim * n_dim,
            bytes_accessed=(
                m_pad * k_dim * 2
                + e * k_dim * n_dim * rhs.dtype.itemsize
                + m_pad * n_dim * np.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(expert_of_tile, scales, lhs, rhs)


def grouped_gemm(
    lhs: jax.Array,  # [num_rows, K] — rows sorted by group
    rhs: jax.Array,  # [E, K, N] bf16 or int8 e4m3 bits
    group_sizes: jax.Array,  # [E] int32 (traced)
    scales: Optional[jax.Array] = None,
    *,
    tm: int = 128,
    tn: Optional[int] = None,
    tk: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Convenience wrapper: ``lax.ragged_dot`` semantics (rows pre-sorted by
    group) on the Pallas kernel. Builds the padded layout, runs the GEMM,
    gathers the real rows back. For multi-GEMM pipelines (MoE), use the
    padded-level API directly and stay in padded space between GEMMs."""
    num_rows, k_dim = lhs.shape
    fp8 = rhs.dtype == jnp.int8
    layout = make_group_layout(group_sizes, num_rows, tm)
    x = lhs[layout.src_row]
    if fp8:
        _, tk_sel = _choose_tiles(
            layout.m_pad, k_dim, rhs.shape[2], tm, fp8, tn, tk
        )
        tk = tk_sel
        x = x[:, fp8_k_permutation(k_dim, tk)]
    x = jnp.where(layout.src_valid[:, None], x, 0).astype(jnp.bfloat16)
    out = grouped_gemm_padded(
        x, rhs, layout.expert_of_tile, scales,
        tn=tn, tk=tk, out_dtype=out_dtype or lhs.dtype, interpret=interpret,
    )
    return out[layout.padded_pos]
