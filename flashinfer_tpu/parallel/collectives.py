"""Collective-compute fusions and MoE EP dispatch/combine.

Reference parity (flashinfer/comm/):
  * ``trtllm_custom_all_reduce`` (trtllm_ar.py:696)           -> all_reduce
  * ``trtllm_allreduce_fusion`` (ar + residual + RMSNorm
    + optional fp8/fp4 quant, trtllm_ar.py:772)               -> allreduce_rmsnorm(_quant)
  * ``trtllm_moe_allreduce_fusion`` (trtllm_ar.py:873)        -> moe_allreduce_fusion
  * MoE alltoall dispatch/combine (trtllm_alltoall.py:443)    -> MoeAlltoAll
  * vLLM custom allreduce (vllm_ar.py)                        -> all_reduce
  * MNNVL multicast allreduce (trtllm_mnnvl_ar.py)            -> all_reduce over
    whatever axis spans DCN/ICI — XLA picks the transport.

TPU stance: the reference hand-writes IPC/multicast kernels because NCCL
launches cost too much at decode latency; on TPU the ICI collectives are
compiler-scheduled (no launch overhead to dodge), so "fusion" means giving
XLA one jitted region where the psum result feeds the norm/quant math — XLA
overlaps the collective with neighboring compute. These helpers exist so
engines have drop-in named ops with the reference's signatures and so the
fusion boundary is explicit and testable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flashinfer_tpu.ops.fp8 import fp8_quantize_rowwise
from flashinfer_tpu.ops.norm import rmsnorm

__all__ = [
    "all_reduce",
    "allreduce_rmsnorm",
    "allreduce_rmsnorm_quant_fp8",
    "gemm_allreduce",
    "moe_allreduce_fusion",
    "MoeAlltoAll",
]


def gemm_allreduce(
    x: jax.Array,
    w: jax.Array,
    axis_name: str = "tp",
    *,
    out_dtype=None,
) -> jax.Array:
    """Row-parallel GEMM + allreduce in one fused region (reference
    cute_dsl/gemm_allreduce_two_shot.py:103 PersistentDenseGemmKernel — a
    persistent GEMM whose epilogue runs a two-shot allreduce). On TPU the
    fusion is the jit region: XLA tiles the matmul and can overlap the
    psum's ICI transfers with trailing MXU tiles (latency-hiding scheduler).
    UNMEASURED: the overlap claim is XLA-documented behavior, not something
    this repo has profiled — no multi-chip hardware is available to this
    build; only the numerics are tested (test_parallel). Call inside
    shard_map with x [m, k_local], w [k_local, n]."""
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out = jax.lax.psum(acc, axis_name)
    return out.astype(out_dtype or x.dtype)


def all_reduce(x: jax.Array, axis_name: str = "tp") -> jax.Array:
    """psum over the named mesh axis. Call inside shard_map/jit with a mesh
    in scope (the role of trtllm/vllm custom allreduce kernels)."""
    return jax.lax.psum(x, axis_name)


def allreduce_rmsnorm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    axis_name: str = "tp",
) -> Tuple[jax.Array, jax.Array]:
    """allreduce + residual add + RMSNorm in one fused region (reference
    trtllm_allreduce_fusion, kernels trtllm_allreduce_fusion.cuh:1515).
    Returns (normed, new_residual)."""
    full = jax.lax.psum(x, axis_name)
    new_residual = (full.astype(jnp.float32)
                    + residual.astype(jnp.float32)).astype(x.dtype)
    return rmsnorm(new_residual, weight, eps), new_residual


def allreduce_rmsnorm_quant_fp8(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    axis_name: str = "tp",
):
    """allreduce + add + norm + fp8 rowwise quant (the FP8-quant-out fusion
    variant, trtllm_ar.py:772 pattern). Returns (q, scale, new_residual)."""
    normed, new_residual = allreduce_rmsnorm(x, residual, weight, eps,
                                             axis_name)
    q, scale = fp8_quantize_rowwise(normed)
    return q, scale, new_residual


def moe_allreduce_fusion(
    moe_out: jax.Array,
    scale: jax.Array,
    shared_out: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    axis_name: str = "tp",
) -> Tuple[jax.Array, jax.Array]:
    """MoE finalize + allreduce + residual + norm (reference
    trtllm_moe_allreduce_fusion, trtllm_moe_allreduce_fusion.cuh:1494):
    out = rmsnorm(psum(moe_out * scale) + shared_out + residual)."""
    contrib = moe_out.astype(jnp.float32) * scale
    full = jax.lax.psum(contrib, axis_name)
    new_residual = (
        full + shared_out.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(moe_out.dtype)
    return rmsnorm(new_residual, weight, eps), new_residual


class MoeAlltoAll:
    """EP dispatch/combine over the 'ep' mesh axis (reference
    comm/trtllm_alltoall.py MnnvlMoe.mnnvl_moe_alltoallv* :443-552).

    Capacity-based: each device sends at most ``capacity`` tokens to each
    peer per step (static shapes). dispatch() routes token copies to the
    device owning their expert; combine() routes results back and sums the
    top-k contributions.

    Use inside shard_map with in/out specs over the ep axis.
    """

    def __init__(self, num_experts: int, capacity: int, axis_name: str = "ep"):
        self.num_experts = num_experts
        self.capacity = capacity
        self.axis_name = axis_name

    def dispatch(
        self,
        x: jax.Array,  # [local_tokens, hidden]
        expert_ids: jax.Array,  # [local_tokens, top_k]
    ):
        """Returns (recv_x [ep*capacity, hidden], recv_expert [ep*capacity],
        send_slot [local_tokens, top_k] — slot each copy landed in, for
        combine; -1 = dropped by capacity)."""
        ep = jax.lax.axis_size(self.axis_name)
        eper = self.num_experts // ep
        m, top_k = expert_ids.shape
        hidden = x.shape[1]
        dest = expert_ids // eper  # [m, k] target device

        flat_dest = dest.reshape(-1)
        # slot within the destination buffer: running count per dest
        onehot = jax.nn.one_hot(flat_dest, ep, dtype=jnp.int32)
        slot_in_dest = jnp.cumsum(onehot, axis=0) - onehot
        slot = jnp.sum(slot_in_dest * onehot, axis=1)  # [m*k]
        keep = slot < self.capacity
        slot = jnp.where(keep, slot, -1)

        send_x = jnp.zeros((ep, self.capacity, hidden), x.dtype)
        send_e = jnp.full((ep, self.capacity), -1, jnp.int32)
        tok = jnp.arange(m * top_k) // top_k
        # dropped copies scatter out of bounds (mode="drop") — routing them
        # to a real slot would overwrite a kept token's row
        d_idx = jnp.where(keep, flat_dest, ep)
        s_idx = jnp.where(keep, slot, self.capacity)
        send_x = send_x.at[d_idx, s_idx].set(x[tok], mode="drop")
        send_e = send_e.at[d_idx, s_idx].set(
            expert_ids.reshape(-1), mode="drop")

        recv_x = jax.lax.all_to_all(send_x, self.axis_name, 0, 0, tiled=True)
        recv_e = jax.lax.all_to_all(send_e, self.axis_name, 0, 0, tiled=True)
        return (
            recv_x.reshape(ep * self.capacity, hidden),
            recv_e.reshape(-1),
            slot.reshape(m, top_k),
        )

    def combine(
        self,
        y: jax.Array,  # [ep*capacity, hidden] processed tokens
        send_slot: jax.Array,  # [m, top_k] from dispatch
        expert_ids: jax.Array,  # [m, top_k]
        scales: jax.Array,  # [m, top_k]
    ) -> jax.Array:
        """Route results back and combine weighted top-k contributions."""
        ep = jax.lax.axis_size(self.axis_name)
        eper = self.num_experts // ep
        m, top_k = expert_ids.shape
        hidden = y.shape[1]
        back = jax.lax.all_to_all(
            y.reshape(ep, self.capacity, hidden), self.axis_name, 0, 0,
            tiled=True,
        )  # [ep, capacity, hidden]: slot s sent to device d now at [d, s]
        dest = expert_ids // eper
        valid = send_slot >= 0
        d_idx = jnp.where(valid, dest, 0)
        s_idx = jnp.where(valid, send_slot, 0)
        gathered = back[d_idx, s_idx]  # [m, k, hidden]
        gathered = jnp.where(valid[..., None], gathered, 0)
        return jnp.sum(
            gathered.astype(jnp.float32) * scales[..., None], axis=1
        ).astype(y.dtype)
