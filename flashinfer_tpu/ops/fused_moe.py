"""Fused Mixture-of-Experts.

Reference parity: flashinfer/fused_moe/core.py — ``cutlass_fused_moe``
(:758), ``RoutingMethodType`` (:62), ``GatedActType`` (:164), and the
trtllm-gen quantized variants (``trtllm_fp8_per_tensor_scale_moe`` :1669,
``trtllm_fp8_block_scale_moe``, ``trtllm_fp4_block_scale_moe`` :1951);
kernels csrc/fused_moe/cutlass_backend/cutlass_fused_moe_kernels.cuh and the
routing kernels csrc/trtllm_fused_moe_routing_*.cu.

TPU-first pipeline (single device; EP/TP sharding composes on top via
parallel/, see parallel/moe.py):
  routing (top-k over router logits, several methods)
  → stable argsort tokens by expert (XLA sort — the permute/scatter kernels
    of the reference collapse into one gather)
  → grouped GEMM1 via ``lax.ragged_dot`` (+ gated activation)
  → grouped GEMM2 via ``lax.ragged_dot``
  → unpermute-and-combine weighted by router scores.
Everything is traced — group sizes are traced arrays, no host sync, one
compiled program for any routing outcome (the CUDA-graph-stability analogue).
"""

from __future__ import annotations

import enum
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.activation import gelu_and_mul, silu_and_mul
from flashinfer_tpu.ops.fp4 import fp4_dequantize

__all__ = [
    "RoutingMethodType",
    "GatedActType",
    "route_tokens",
    "fused_moe",
    "cutlass_fused_moe",
    "trtllm_fp8_per_tensor_scale_moe",
    "trtllm_fp8_block_scale_moe",
    "trtllm_fp4_block_scale_moe",
]


class RoutingMethodType(enum.IntEnum):
    """Reference fused_moe/core.py:62-77."""

    Default = 0  # softmax -> top-k
    Renormalize = 1  # top-k -> renormalized softmax over the k
    DeepSeekV3 = 2  # sigmoid scores, group-limited top-k, renormalize
    Llama4 = 3  # top-1 -> sigmoid scale
    RenormalizeNaive = 4  # softmax -> top-k -> renormalize
    TopK = 5  # plain top-k scores


class GatedActType(enum.IntEnum):
    """Reference fused_moe/core.py:164."""

    SwiGlu = 0
    GeGlu = 1


def route_tokens(
    router_logits: jax.Array,  # [m, num_experts] (scores for sigmoid methods)
    top_k: int,
    routing_method: RoutingMethodType = RoutingMethodType.Default,
    *,
    n_group: Optional[int] = None,
    topk_group: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    routing_bias: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (expert_ids [m, k] int32, scales [m, k] f32).

    Implements the reference's routing taxonomy (RoutingKernel.cuh:684,
    fused_moe/core.py RoutingMethodType)."""
    x = router_logits.astype(jnp.float32)
    m, e = x.shape

    if routing_method == RoutingMethodType.Default:
        probs = jax.nn.softmax(x, axis=-1)
        scales, ids = jax.lax.top_k(probs, top_k)
    elif routing_method == RoutingMethodType.Renormalize:
        vals, ids = jax.lax.top_k(x, top_k)
        scales = jax.nn.softmax(vals, axis=-1)
    elif routing_method == RoutingMethodType.RenormalizeNaive:
        probs = jax.nn.softmax(x, axis=-1)
        scales, ids = jax.lax.top_k(probs, top_k)
        scales = scales / jnp.sum(scales, axis=-1, keepdims=True)
    elif routing_method == RoutingMethodType.Llama4:
        assert top_k == 1
        vals, ids = jax.lax.top_k(x, 1)
        scales = jax.nn.sigmoid(vals)
    elif routing_method == RoutingMethodType.TopK:
        scales, ids = jax.lax.top_k(x, top_k)
    elif routing_method == RoutingMethodType.DeepSeekV3:
        scores = jax.nn.sigmoid(x)
        biased = scores if routing_bias is None else scores + routing_bias
        ng = n_group or 1
        tg = topk_group or ng
        grouped = biased.reshape(m, ng, e // ng)
        # group score = sum of top-2 in group (DeepSeek-V3 rule)
        top2 = jax.lax.top_k(grouped, min(2, e // ng))[0].sum(-1)
        _, keep_groups = jax.lax.top_k(top2, tg)
        group_mask = jnp.zeros((m, ng), bool).at[
            jnp.arange(m)[:, None], keep_groups
        ].set(True)
        masked = jnp.where(
            jnp.repeat(group_mask, e // ng, axis=1), biased, -jnp.inf
        )
        _, ids = jax.lax.top_k(masked, top_k)
        picked = jnp.take_along_axis(scores, ids, axis=1)
        scales = picked / jnp.sum(picked, axis=-1, keepdims=True)
        scales = scales * routed_scaling_factor
    else:
        raise ValueError(f"unknown routing method {routing_method}")
    return ids.astype(jnp.int32), scales.astype(jnp.float32)


def _select_moe_gemm_dtype(hidden_states, w13, w2, group_sizes, gated_act):
    """Autotuned accumulation dtype for the gate/up ragged GEMM (reference
    autotuner.py:349 drives cutlass MoE tactic ids the same way): 'input'
    halves the activation-pass HBM for bf16 models; 'f32' wins when XLA
    fuses the activation into the GEMM epilogue. Consults the persisted
    winner at trace time; profiles inside autotune() on concrete arrays."""
    from flashinfer_tpu.autotuner import AutoTuner, TunableRunner

    in_dt = hidden_states.dtype
    if in_dt == jnp.float32:
        return jnp.float32
    m, hidden = hidden_states.shape
    e, two_inter, _ = w13.shape
    tactics = [{"h1_acc": "input"}, {"h1_acc": "f32"}]
    op_key = f"fused_moe_h1::m{m}::e{e}::h{hidden}::i2{two_inter}::{in_dt.name}"
    tuner = AutoTuner.get()
    sel = tuner.cached(op_key, tactics)
    if sel is None and tuner.enabled and not isinstance(
        hidden_states, jax.core.Tracer
    ):
        from flashinfer_tpu.testing.utils import bench_tpu_time_differential

        act = silu_and_mul if gated_act == GatedActType.SwiGlu else gelu_and_mul

        class _Runner(TunableRunner):
            def get_valid_tactics(self):
                return tactics

            def run(self, tactic, *args):
                raise NotImplementedError  # timed via time_tactic

        def time_tactic(tactic):
            acc = in_dt if tactic["h1_acc"] == "input" else jnp.float32

            def step(carry, w13a, w2a, gs):
                h1 = jax.lax.ragged_dot(
                    carry, jnp.swapaxes(w13a, 1, 2), gs,
                    preferred_element_type=acc,
                )
                h2 = jax.lax.ragged_dot(
                    act(h1), jnp.swapaxes(w2a, 1, 2), gs,
                    preferred_element_type=jnp.float32,
                )
                dep = jnp.sum(h2) * 1e-30
                return carry + dep.astype(carry.dtype)

            return bench_tpu_time_differential(
                step, hidden_states, w13, w2, group_sizes,
                n_short=2, n_long=26, repeats=6,
            )

        sel = tuner.choose_one(op_key, _Runner(), time_tactic=time_tactic)
    if sel is not None and sel["h1_acc"] == "f32":
        return jnp.float32
    return in_dt


def _permute_by_expert(expert_ids: jax.Array, num_experts: int):
    """Stable sort of (token, k)-pairs by expert. Returns (order [m*k],
    group_sizes [e])."""
    flat = expert_ids.reshape(-1)
    order = jnp.argsort(flat, stable=True)
    group_sizes = jnp.bincount(flat, length=num_experts).astype(jnp.int32)
    return order, group_sizes


def _scales_1d(s) -> bool:
    return s is None or jnp.asarray(s).ndim <= 1


def _pallas_moe_eligible(hidden_states, w13, w2, w13_scale, w2_scale,
                         weights_kn: bool) -> bool:
    """The Pallas grouped GEMM wants MXU-tileable dims (128 | every GEMM
    dim), per-expert (or scalar) dequant scales, and bf16/fp8 operands.
    Anything else routes to the XLA ragged_dot path."""
    if weights_kn:
        e, hidden, two_inter = w13.shape
        _, inter, hidden2 = w2.shape
    else:
        e, two_inter, hidden = w13.shape
        _, hidden2, inter = w2.shape
    if hidden % 128 or two_inter % 256 or inter % 128 or hidden2 % 128:
        return False
    if not (_scales_1d(w13_scale) and _scales_1d(w2_scale)):
        return False
    ok_w = (jnp.bfloat16, jnp.float8_e4m3fn, jnp.int8)
    if w13.dtype not in ok_w or w2.dtype not in ok_w:
        return False
    return hidden_states.dtype in (jnp.bfloat16, jnp.float32)


def _select_moe_tm(m_rows: int, e: int, hidden: int, inter: int,
                   fp8: bool) -> int:
    """m-tile for the padded group layout. Small tiles waste less padding
    (≤ e*(tm-1) zero rows); big tiles re-read expert weights fewer times
    (reads/expert ≈ tiles/expert). Heuristic default, autotuner override
    (tactics = the legal sizes; `flashinfer_tpu tune` profiles them)."""
    from flashinfer_tpu.autotuner import AutoTuner

    default = 256 if m_rows >= 4 * e * 128 else 128
    tactics = [{"tm": t} for t in
               sorted({default, 128, 256, 512}, key=lambda t: t != default)]
    op_key = (
        f"moe_gg_tm::m{_bucket_rows(m_rows)}::e{e}::h{hidden}::i{inter}"
        f"::fp8{int(fp8)}"
    )
    sel = AutoTuner.get().cached(op_key, tactics)
    return sel["tm"] if sel is not None else default


def _bucket_rows(m: int) -> int:
    b = 128
    while b < m:
        b *= 2
    return b


def _fused_moe_pallas(
    hidden_states, w13, w2, expert_ids, expert_scales, gated_act,
    w13_scale, w2_scale, out_dtype, interpret, weights_kn,
):
    """Padded-layout pipeline on the Pallas grouped GEMM (gemm_grouped.py):
    ONE gather in, both GEMMs + activation in tile-aligned padded space,
    one gather out. fp8 expert weights dequantize in-kernel — no bf16
    weight copy is ever materialized (reference mainloop-dequant parity:
    cutlass_fused_moe_kernels.cuh)."""
    from flashinfer_tpu.ops.gemm_grouped import (
        _choose_tiles,
        fp8_k_permutation,
        grouped_gemm_padded,
        make_group_layout,
    )

    m, hidden = hidden_states.shape
    e = w13.shape[0]
    two_inter = w13.shape[2] if weights_kn else w13.shape[1]
    inter = two_inter // 2
    top_k = expert_ids.shape[1]

    def prep(w):
        if w.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            w = jax.lax.bitcast_convert_type(w, jnp.int8)
        if not weights_kn:
            w = jnp.swapaxes(w, 1, 2)
        return w

    w13 = prep(w13)  # [E, hidden, 2*inter]
    w2 = prep(w2)  # [E, inter, hidden]
    fp8_13 = w13.dtype == jnp.int8
    fp8_2 = w2.dtype == jnp.int8

    order, group_sizes = _permute_by_expert(expert_ids, e)
    token_of = order // top_k
    tm = _select_moe_tm(m * top_k, e, hidden, inter, fp8_13)
    layout = make_group_layout(group_sizes, m * top_k, tm)
    _, tk1 = _choose_tiles(
        layout.m_pad, hidden, two_inter, tm, fp8_13, None, None
    )
    _, tk2 = _choose_tiles(layout.m_pad, inter, hidden, tm, fp8_2, None, None)

    # gather in (token rows -> padded layout); the fp8 K-permutation is a
    # static index fold into the same gather — no extra pass
    row_src = jnp.where(layout.src_valid, token_of[layout.src_row], 0)
    x_pad = hidden_states[row_src]
    if fp8_13:
        x_pad = x_pad[:, fp8_k_permutation(hidden, tk1)]
    x_pad = jnp.where(layout.src_valid[:, None], x_pad, 0).astype(jnp.bfloat16)

    h1 = grouped_gemm_padded(
        x_pad, w13, layout.expert_of_tile, w13_scale,
        tk=tk1, out_dtype=jnp.bfloat16, interpret=interpret,
    )
    g, u = h1[:, :inter], h1[:, inter:]
    if fp8_2:
        p2 = fp8_k_permutation(inter, tk2)
        g, u = g[:, p2], u[:, p2]
    g32 = g.astype(jnp.float32)
    if gated_act == GatedActType.SwiGlu:
        a = g32 * jax.nn.sigmoid(g32)
    else:
        a = jax.nn.gelu(g32, approximate=False)
    h_mid = (a * u.astype(jnp.float32)).astype(jnp.bfloat16)

    # f32 output: feeds the f32 top-k combine (same choice as the XLA path)
    h2 = grouped_gemm_padded(
        h_mid, w2, layout.expert_of_tile, w2_scale,
        tk=tk2, out_dtype=jnp.float32, interpret=interpret,
    )
    inv = jnp.argsort(order)
    h2_tok = h2[layout.padded_pos[inv]].reshape(m, top_k, hidden)
    out = jnp.sum(h2_tok * expert_scales[:, :, None], axis=1)
    return out.astype(out_dtype)


def fused_moe(
    hidden_states: jax.Array,  # [m, hidden]
    w13: jax.Array,  # [e, 2*inter, hidden]  (gate||up rows, NT layout)
    w2: jax.Array,  # [e, hidden, inter]
    expert_ids: jax.Array,  # [m, top_k]
    expert_scales: jax.Array,  # [m, top_k]
    *,
    gated_act: GatedActType = GatedActType.SwiGlu,
    w13_scale: Optional[jax.Array] = None,  # dequant scale(s) for fp8 weights
    w2_scale: Optional[jax.Array] = None,
    out_dtype=None,
    backend: str = "auto",  # auto | pallas | xla
    interpret: Optional[bool] = None,
    weights_kn: bool = False,  # weights pre-transposed to [E, K, N]
) -> jax.Array:
    """Single-device fused MoE (the compute core of cutlass_fused_moe,
    reference fused_moe/core.py:758).

    backend="pallas" (the TPU default when shapes are MXU-tileable) runs
    both expert GEMMs on the tile-aligned Pallas grouped GEMM with
    IN-KERNEL fp8 dequant — quantized weights are never materialized in
    bf16 (reference parity: the CUTLASS mainloop dequant,
    cutlass_fused_moe_kernels.cuh). backend="xla" is the ragged_dot
    fallback (arbitrary shapes/dtypes; fp8 weights dequantize to a bf16
    copy first). ``weights_kn`` marks weights already stored [E, K, N]
    (engines do this once at load; saves a per-call transpose)."""
    m, hidden = hidden_states.shape
    if weights_kn:
        e, _, two_inter = w13.shape
    else:
        e, two_inter, _ = w13.shape
    inter = two_inter // 2
    top_k = expert_ids.shape[1]
    out_dtype = out_dtype or hidden_states.dtype

    from flashinfer_tpu.utils import on_tpu

    eligible = _pallas_moe_eligible(
        hidden_states, w13, w2, w13_scale, w2_scale, weights_kn
    )
    if backend == "pallas" and not eligible:
        raise ValueError(
            "fused_moe backend='pallas' needs 128-divisible GEMM dims, "
            "per-expert scales, and bf16/fp8 weights"
        )
    if backend == "pallas" or (
        backend == "auto" and eligible and (on_tpu() or interpret)
    ):
        return _fused_moe_pallas(
            hidden_states, w13, w2, expert_ids, expert_scales, gated_act,
            w13_scale, w2_scale, out_dtype, interpret, weights_kn,
        )
    if weights_kn:
        w13 = jnp.swapaxes(w13, 1, 2)
        w2 = jnp.swapaxes(w2, 1, 2)

    def deq(w, s):
        if w.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2) or s is not None:
            from flashinfer_tpu.ops.fp8 import fp8_to_bf16

            w = fp8_to_bf16(w)
            if s is not None:
                s = jnp.asarray(s, jnp.float32)
                s = s.reshape(-1, 1, 1) if s.ndim <= 1 else s
                w = (w.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return w

    w13 = deq(w13, w13_scale)
    w2 = deq(w2, w2_scale)

    order, group_sizes = _permute_by_expert(expert_ids, e)
    token_of = order // top_k
    x_sorted = hidden_states[token_of]  # [m*k, hidden]

    # First GEMM outputs in the input dtype by default: the MXU accumulates
    # in f32 internally, and an f32 [m*k, 2*inter] intermediate would cost
    # 2x HBM on the act pass for bf16 models. The autotuner can flip this
    # to f32 per shape bucket (XLA sometimes fuses the act into the GEMM,
    # making the wide intermediate free). The second (down-projection) GEMM
    # keeps its f32 accumulator: its output feeds the f32 top-k combine
    # anyway, so full-precision accumulation over inter_size is free.
    cdt = _select_moe_gemm_dtype(x_sorted, w13, w2, group_sizes, gated_act)
    h1 = jax.lax.ragged_dot(
        x_sorted, jnp.swapaxes(w13, 1, 2), group_sizes,
        preferred_element_type=cdt,
    )  # [m*k, 2*inter]
    act = silu_and_mul if gated_act == GatedActType.SwiGlu else gelu_and_mul
    h1 = act(h1)
    h2 = jax.lax.ragged_dot(
        h1, jnp.swapaxes(w2, 1, 2), group_sizes,
        preferred_element_type=jnp.float32,
    )  # [m*k, hidden] f32

    # unpermute with an inverse-permutation GATHER (a scatter-add unpermute
    # lowers to a slow sorted-scatter loop on TPU) + weighted top-k combine
    inv = jnp.argsort(order)
    h2_tok = h2[inv].reshape(m, top_k, hidden)
    out = jnp.sum(h2_tok * expert_scales[:, :, None], axis=1)
    return out.astype(out_dtype)


def cutlass_fused_moe(
    input: jax.Array,
    token_selected_experts: jax.Array,
    token_final_scales: jax.Array,
    fc1_expert_weights: jax.Array,
    fc2_expert_weights: jax.Array,
    output_dtype=None,
    *,
    quant_scales: Sequence[jax.Array] = (),
    tp_size: int = 1,
    tp_rank: int = 0,
    ep_size: int = 1,
    ep_rank: int = 0,
    **_compat,
) -> jax.Array:
    """API-parity entry point (reference fused_moe/core.py:758). tp/ep args
    are accepted; sharded execution composes via parallel/moe.py (pass
    locally-sharded weights and the local expert id range)."""
    w13_scale = quant_scales[0] if len(quant_scales) > 0 else None
    w2_scale = quant_scales[1] if len(quant_scales) > 1 else None
    return fused_moe(
        input,
        fc1_expert_weights,
        fc2_expert_weights,
        token_selected_experts,
        token_final_scales,
        w13_scale=w13_scale,
        w2_scale=w2_scale,
        out_dtype=output_dtype,
    )


def trtllm_fp8_per_tensor_scale_moe(
    routing_logits: jax.Array,
    routing_bias: Optional[jax.Array],
    hidden_states: jax.Array,
    gemm1_weights: jax.Array,
    output1_scales_scalar: jax.Array,
    gemm2_weights: jax.Array,
    output2_scales_scalar: jax.Array,
    num_experts: int,
    top_k: int,
    n_group: Optional[int],
    topk_group: Optional[int],
    intermediate_size: int,
    local_expert_offset: int = 0,
    local_num_experts: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    use_routing_scales_on_input: bool = False,
    routing_method_type: RoutingMethodType = RoutingMethodType.Default,
    **_compat,
) -> jax.Array:
    """Routing + fp8 per-tensor-scale MoE (reference core.py:1669)."""
    ids, scales = route_tokens(
        routing_logits, top_k, routing_method_type,
        n_group=n_group, topk_group=topk_group,
        routed_scaling_factor=routed_scaling_factor,
        routing_bias=routing_bias,
    )
    return fused_moe(
        hidden_states, gemm1_weights, gemm2_weights, ids, scales,
        w13_scale=output1_scales_scalar, w2_scale=output2_scales_scalar,
        out_dtype=jnp.bfloat16,
    )


def trtllm_fp8_block_scale_moe(
    routing_logits, routing_bias, hidden_states, hidden_states_scale,
    gemm1_weights, gemm1_weights_scale, gemm2_weights, gemm2_weights_scale,
    num_experts, top_k, n_group, topk_group, intermediate_size,
    local_expert_offset: int = 0, local_num_experts: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    routing_method_type: RoutingMethodType = RoutingMethodType.DeepSeekV3,
    **_compat,
) -> jax.Array:
    """fp8 with 128-block weight scales (reference core.py trtllm_fp8_block_
    scale_moe): dequantize blockwise then run the grouped pipeline."""
    def deq_block(w, s):
        # w [e, n, k] e4m3, s [e, n/128, k/128]
        e, n, k = w.shape
        from flashinfer_tpu.ops.fp8 import fp8_to_bf16

        sn = jnp.repeat(jnp.repeat(s.astype(jnp.float32), 128, 1), 128, 2)
        # e4m3 -> bf16 via the bit decode; float8 astype is ~8x slower
        return (fp8_to_bf16(w).astype(jnp.float32) * sn[:, :n, :k]).astype(
            jnp.bfloat16)

    ids, scales = route_tokens(
        routing_logits, top_k, routing_method_type,
        n_group=n_group, topk_group=topk_group,
        routed_scaling_factor=routed_scaling_factor, routing_bias=routing_bias,
    )
    hs = hidden_states
    if hidden_states_scale is not None:
        from flashinfer_tpu.ops.fp8 import fp8_to_bf16

        k_tiles = hs.shape[1] // 128
        hsf = fp8_to_bf16(hs).astype(jnp.float32).reshape(
            hs.shape[0], k_tiles, 128)
        hs = (hsf * hidden_states_scale.astype(jnp.float32)[..., None]).reshape(
            hs.shape[0], -1
        ).astype(jnp.bfloat16)
    return fused_moe(
        hs, deq_block(gemm1_weights, gemm1_weights_scale),
        deq_block(gemm2_weights, gemm2_weights_scale), ids, scales,
        out_dtype=jnp.bfloat16,
    )


def trtllm_fp4_block_scale_moe(
    routing_logits, routing_bias, hidden_states, hidden_states_scale,
    gemm1_weights, gemm1_weights_scale, gemm2_weights, gemm2_weights_scale,
    *args, num_experts=None, top_k=1, n_group=None, topk_group=None,
    intermediate_size=None, routed_scaling_factor: float = 1.0,
    routing_method_type: RoutingMethodType = RoutingMethodType.Renormalize,
    **_compat,
) -> jax.Array:
    """fp4 (mxfp4) block-scale MoE (reference core.py:1951)."""
    ids, scales = route_tokens(
        routing_logits, top_k, routing_method_type,
        n_group=n_group, topk_group=topk_group,
        routed_scaling_factor=routed_scaling_factor, routing_bias=routing_bias,
    )
    w13 = fp4_dequantize(gemm1_weights, gemm1_weights_scale, sf_vec_size=32,
                         sf_use_ue8m0=True, dtype=jnp.bfloat16)
    w2 = fp4_dequantize(gemm2_weights, gemm2_weights_scale, sf_vec_size=32,
                        sf_use_ue8m0=True, dtype=jnp.bfloat16)
    return fused_moe(hidden_states, w13, w2, ids, scales,
                     out_dtype=jnp.bfloat16)
