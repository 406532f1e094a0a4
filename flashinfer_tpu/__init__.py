"""flashinfer_tpu — a TPU-native LLM-serving kernel engine.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
FlashInfer (the CUDA reference surveyed in SURVEY.md): paged/ragged
variable-length attention with a host-side plan / device-side run split,
cascade + MLA + sparse attention, sorting-free sampling, norm/RoPE/activation
/quantization ops, grouped & quantized GEMM, fused MoE, and a distributed
layer mapping TP/PP/DP/EP/CP onto a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from flashinfer_tpu.ops.attention.state import (
    merge_state,
    merge_state_in_place,
    merge_states,
    variable_length_merge_states,
)
from flashinfer_tpu.ops.page import (
    append_paged_kv_cache,
    append_paged_mla_kv_cache,
    block_sparse_indices_to_vector_sparse_offsets,
    get_batch_indices_positions,
    get_seq_lens,
)
from flashinfer_tpu.utils import MaskMode, PosEncodingMode, TensorLayout

__all__ = [
    "__version__",
    "MaskMode",
    "PosEncodingMode",
    "TensorLayout",
    "merge_state",
    "merge_state_in_place",
    "merge_states",
    "variable_length_merge_states",
    "append_paged_kv_cache",
    "append_paged_mla_kv_cache",
    "get_batch_indices_positions",
    "get_seq_lens",
    "block_sparse_indices_to_vector_sparse_offsets",
]
