"""Distributed layer: topology math, mesh construction, collectives,
ring/Ulysses attention, and TP serving (SURVEY.md §2.3)."""

from flashinfer_tpu.parallel.collectives import (
    MoeAlltoAll,
    all_reduce,
    allreduce_rmsnorm,
    allreduce_rmsnorm_quant_fp8,
    gemm_allreduce,
    moe_allreduce_fusion,
)
from flashinfer_tpu.parallel.mapping import Mapping
from flashinfer_tpu.parallel.moe import (
    fused_moe_ep,
    fused_moe_tp,
    moe_ep_capacity,
)
from flashinfer_tpu.parallel.pipeline import (
    llama_forward_pipelined,
    pipeline_forward,
)
from flashinfer_tpu.parallel.mesh import (
    MeshContext,
    make_mesh,
    shard_kv_cache_spec,
    shard_model_specs,
)
from flashinfer_tpu.parallel.ring_attention import ring_attention, ulysses_attention
from flashinfer_tpu.parallel.tp_serving import (
    make_tp_decode_step,
    shard_llama_params_tp,
    tp_param_specs,
)

__all__ = [
    "Mapping",
    "MeshContext",
    "fused_moe_ep",
    "fused_moe_tp",
    "moe_ep_capacity",
    "llama_forward_pipelined",
    "pipeline_forward",
    "make_mesh",
    "shard_model_specs",
    "shard_kv_cache_spec",
    "all_reduce",
    "allreduce_rmsnorm",
    "allreduce_rmsnorm_quant_fp8",
    "gemm_allreduce",
    "moe_allreduce_fusion",
    "MoeAlltoAll",
    "ring_attention",
    "ulysses_attention",
    "make_tp_decode_step",
    "shard_llama_params_tp",
    "tp_param_specs",
]
