"""Expert-parallel (EP) sharded MoE layer.

Reference parity: the tp/ep args of ``cutlass_fused_moe``
(flashinfer/fused_moe/core.py:758) composed with the MoE alltoall
dispatch/combine kernels (comm/trtllm_alltoall.py:443-552). The reference
ships these as separate pieces the serving engine wires together; here the
assembled layer is provided directly, TPU-style: one ``shard_map`` over the
``ep`` mesh axis whose body is route -> alltoall dispatch -> the local
grouped-GEMM expert MLP (ops/fused_moe.fused_moe, so fp8/fp4 weight paths
come along for free) -> alltoall combine.

Static shapes throughout: dispatch is capacity-based (each device sends at
most ``capacity`` token-copies to each peer), so one compiled program
serves any routing outcome — the CUDA-graph-stability analogue.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flashinfer_tpu.ops.fused_moe import (
    GatedActType,
    RoutingMethodType,
    fused_moe,
    route_tokens,
)
from flashinfer_tpu.parallel.collectives import MoeAlltoAll

__all__ = ["fused_moe_ep", "fused_moe_tp", "moe_ep_capacity"]


def _shard_w13_for_tp(w13: jax.Array) -> jax.Array:
    """View w13 [E, 2*inter, hidden] as [E, 2, inter, hidden] so a
    PartitionSpec on axis 2 shards the gate half AND the up half (a naive
    split of the 2*inter axis would give one device all-gate, another
    all-up — reference Mapping shards the inter dim, comm/mapping.py:127)."""
    e, two_inter, hidden = w13.shape
    return w13.reshape(e, 2, two_inter // 2, hidden)


def fused_moe_tp(
    hidden_states: jax.Array,  # [tokens, hidden] (replicated over moe_tp)
    router_logits: jax.Array,  # [tokens, num_experts]
    w13: jax.Array,  # [num_experts, 2*inter, hidden]
    w2: jax.Array,  # [num_experts, hidden, inter]
    mesh: Mesh,
    *,
    top_k: int,
    axis_name: str = "moe_tp",
    routing_method: RoutingMethodType = RoutingMethodType.Default,
    gated_act: GatedActType = GatedActType.SwiGlu,
    n_group: Optional[int] = None,
    topk_group: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    routing_bias: Optional[jax.Array] = None,
    w13_scale: Optional[jax.Array] = None,
    w2_scale: Optional[jax.Array] = None,
    backend: str = "auto",
) -> jax.Array:
    """MoE tensor parallelism (reference Mapping moe_tp factorization,
    comm/mapping.py:127-148): every device holds ALL experts but 1/tp of
    the intermediate dimension — gate, up, and down projections shard on
    inter, and the down-projection partials reduce with one psum. No
    token movement (vs EP's alltoall); the right choice when experts are
    few/large or routing is skewed.

    Exact (no capacity drops): bitwise-equivalent to the single-device
    ``fused_moe`` up to f32 summation order."""
    num_experts, two_inter, hidden = w13.shape
    inter = two_inter // 2
    tp = mesh.shape[axis_name]
    assert inter % tp == 0, (inter, tp)

    def body(x, logits, w13_l, w2_l):
        ids, scales = route_tokens(
            logits, top_k, routing_method,
            n_group=n_group, topk_group=topk_group,
            routed_scaling_factor=routed_scaling_factor,
            routing_bias=routing_bias,
        )
        y = fused_moe(
            x, w13_l.reshape(num_experts, -1, hidden), w2_l, ids, scales,
            gated_act=gated_act,
            w13_scale=w13_scale, w2_scale=w2_scale,
            backend=backend, out_dtype=jnp.float32,
        )
        return jax.lax.psum(y, axis_name).astype(hidden_states.dtype)

    rep = P(*(None,) * 2)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            rep, rep,
            P(None, None, axis_name, None),  # [E, 2, inter/tp, hidden]
            P(None, None, axis_name),  # [E, hidden, inter/tp]
        ),
        out_specs=rep,
    )(hidden_states, router_logits, _shard_w13_for_tp(w13), w2)


def moe_ep_capacity(
    tokens_per_device: int, top_k: int, ep: int, capacity_factor: float = 1.5
) -> int:
    """Per-peer send capacity: expected tokens-per-peer times a slack factor
    (the reference sizes its alltoall workspace the same way)."""
    expected = tokens_per_device * top_k / ep
    return max(8, int(expected * capacity_factor + 0.5))


def fused_moe_ep(
    hidden_states: jax.Array,  # [tokens, hidden] (sharded over ep)
    router_logits: jax.Array,  # [tokens, num_experts]
    w13: jax.Array,  # [num_experts, 2*inter, hidden] (sharded over ep)
    w2: jax.Array,  # [num_experts, hidden, inter]
    mesh: Mesh,
    *,
    top_k: int,
    axis_name: str = "ep",
    routing_method: RoutingMethodType = RoutingMethodType.Default,
    gated_act: GatedActType = GatedActType.SwiGlu,
    capacity: Optional[int] = None,
    capacity_factor: float = 1.5,
    n_group: Optional[int] = None,
    topk_group: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    routing_bias: Optional[jax.Array] = None,
    w13_scale: Optional[jax.Array] = None,
    w2_scale: Optional[jax.Array] = None,
    backend: str = "auto",  # fused_moe backend (pallas grouped GEMM | xla)
    tp_axis_name: Optional[str] = None,  # combined moe_tp x ep factorization
) -> jax.Array:
    """EP-sharded MoE layer: tokens sharded over ``axis_name``, experts
    sharded over the same axis (expert e lives on device e // (E/ep)).

    ``tp_axis_name`` enables the combined **moe_tp x ep** factorization the
    reference Mapping derives (comm/mapping.py:127-148): each ep group's
    local experts further shard their INTERMEDIATE dim over moe_tp (gate,
    up, and down projections), with one psum over moe_tp on the
    down-projection partials before the ep combine. Tokens/routing stay
    ep-sharded (replicated over moe_tp).

    Returns [tokens, hidden] with the same sharding as ``hidden_states``.
    Tokens overflowing the per-peer ``capacity`` are dropped from the
    combine (contribute zero), matching capacity-based MoE serving.
    """
    num_experts, two_inter, hidden = w13.shape
    inter = two_inter // 2
    ep = mesh.shape[axis_name]
    assert num_experts % ep == 0, (num_experts, ep)
    eper = num_experts // ep
    tokens = hidden_states.shape[0]
    assert tokens % ep == 0, (tokens, ep)
    if tp_axis_name is not None:
        assert inter % mesh.shape[tp_axis_name] == 0
    if capacity is None:
        capacity = moe_ep_capacity(
            tokens // ep, top_k, ep, capacity_factor
        )
    a2a = MoeAlltoAll(num_experts, capacity, axis_name)

    # per-expert dequant scales shard over ep with the experts (a full [E]
    # scale vector would misindex against the [E/ep] local weight shard)
    def norm_scale(s):
        if s is None:
            return jnp.ones((num_experts,), jnp.float32)
        return jnp.broadcast_to(
            jnp.asarray(s, jnp.float32).reshape(-1), (num_experts,))

    s13 = norm_scale(w13_scale)
    s2 = norm_scale(w2_scale)
    have_scales = w13_scale is not None or w2_scale is not None

    def body(x, logits, w13_l, w2_l, s13_l, s2_l):
        my = jax.lax.axis_index(axis_name)
        ids, scales = route_tokens(
            logits, top_k, routing_method,
            n_group=n_group, topk_group=topk_group,
            routed_scaling_factor=routed_scaling_factor,
            routing_bias=routing_bias,
        )
        recv_x, recv_e, send_slot = a2a.dispatch(x, ids)
        # received copies carry GLOBAL expert ids in this device's range;
        # invalid slots (-1) are clamped to expert 0 — their outputs are
        # dropped by combine's send_slot validity mask, so no masking here
        local_e = jnp.clip(recv_e - my * eper, 0, eper - 1)
        y = fused_moe(
            recv_x, w13_l.reshape(eper, -1, hidden), w2_l,
            local_e[:, None],
            jnp.ones((recv_x.shape[0], 1), jnp.float32),
            gated_act=gated_act,
            w13_scale=s13_l if have_scales else None,
            w2_scale=s2_l if have_scales else None,
            backend=backend,
            out_dtype=jnp.float32,
        )
        if tp_axis_name is not None:
            # down-projection partials (contracted over inter/tp) reduce once
            y = jax.lax.psum(y, tp_axis_name)
        return a2a.combine(y.astype(x.dtype), send_slot, ids, scales)

    tok_spec = P(axis_name, None)
    tp = tp_axis_name
    # w13 viewed [E, 2, inter, hidden] so the tp shard takes 1/tp of the
    # gate half AND the up half (same trick as fused_moe_tp)
    w13_spec = P(axis_name, None, tp, None)
    w2_spec = P(axis_name, None, tp)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(tok_spec, tok_spec, w13_spec, w2_spec,
                  P(axis_name), P(axis_name)),
        out_specs=tok_spec,
    )(hidden_states, router_logits, _shard_w13_for_tp(w13), w2, s13, s2)
