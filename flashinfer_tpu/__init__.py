"""flashinfer_tpu — a TPU-native LLM-serving kernel engine.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
FlashInfer (the CUDA reference surveyed in SURVEY.md): paged/ragged
variable-length attention with a host-side plan / device-side run split,
cascade + MLA + sparse attention, sorting-free sampling, norm/RoPE/activation
/quantization ops, grouped & quantized GEMM, fused MoE, and a distributed
layer mapping TP/PP/DP/EP/CP onto a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from flashinfer_tpu.ops.attention.batch import (
    BatchAttention,
    BatchAttentionWithAttentionSinkWrapper,
    BatchDecodeWithPagedKVCacheWrapper,
    BatchPrefillWithPagedKVCacheWrapper,
    BatchPrefillWithRaggedKVCacheWrapper,
)
from flashinfer_tpu.ops.attention.cascade import MultiLevelCascadeAttentionWrapper
from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper
from flashinfer_tpu.ops.attention.pod import PODWithPagedKVCacheWrapper
from flashinfer_tpu.ops.attention.single import (
    single_decode_with_kv_cache,
    single_prefill_with_kv_cache,
)
from flashinfer_tpu.ops.attention.sparse import (
    BlockSparseAttentionWrapper,
    VariableBlockSparseAttentionWrapper,
)
from flashinfer_tpu.ops.attention.state import (
    merge_state,
    merge_state_in_place,
    merge_states,
    variable_length_merge_states,
)
from flashinfer_tpu.ops.attention.variants import (
    AttentionVariant,
    DefaultAttention,
    FlashSigmoid,
    make_default_variant,
)
from flashinfer_tpu.ops.page import (
    append_paged_kv_cache,
    append_paged_mla_kv_cache,
    block_sparse_indices_to_vector_sparse_offsets,
    get_batch_indices_positions,
    get_seq_lens,
)
from flashinfer_tpu.utils import MaskMode, PosEncodingMode, TensorLayout

from flashinfer_tpu.ops import activation, fp4, fp8, fused_moe, gemm, norm
from flashinfer_tpu.ops import quantization, rope, sampling
from flashinfer_tpu import (  # noqa: F401 — subsystem namespaces
    aot,
    autotuner,
    jit,
    logits_processor,
    models,
    parallel,
    profiler,
    scheduler,
    serving,
    testing,
)
from flashinfer_tpu.ops.activation import (
    gelu_and_mul,
    gelu_tanh_and_mul,
    silu_and_mul,
)
from flashinfer_tpu.ops.gemm import (
    SegmentGEMMWrapper,
    bmm_fp8,
    gemm_fp8_nt_groupwise,
    group_gemm_fp8_nt_groupwise,
    mm_fp4,
)
from flashinfer_tpu.ops.norm import (
    fused_add_rmsnorm,
    gemma_fused_add_rmsnorm,
    gemma_rmsnorm,
    rmsnorm,
)
from flashinfer_tpu.ops.quantization import packbits, segment_packbits
from flashinfer_tpu.ops.rope import (
    apply_llama31_rope,
    apply_llama31_rope_pos_ids,
    apply_rope,
    apply_rope_pos_ids,
    apply_rope_with_cos_sin_cache,
)
from flashinfer_tpu.ops.sampling import (
    chain_speculative_sampling,
    min_p_sampling_from_probs,
    sampling_from_logits,
    sampling_from_probs,
    softmax,
    top_k_mask_logits,
    top_k_renorm_probs,
    top_k_sampling_from_probs,
    top_k_top_p_sampling_from_logits,
    top_k_top_p_sampling_from_probs,
    top_p_renorm_probs,
    top_p_sampling_from_probs,
)

__all__ = [
    "__version__",
    "MaskMode",
    "PosEncodingMode",
    "TensorLayout",
    # attention
    "BatchAttention",
    "BatchAttentionWithAttentionSinkWrapper",
    "BatchDecodeWithPagedKVCacheWrapper",
    "BatchPrefillWithPagedKVCacheWrapper",
    "BatchPrefillWithRaggedKVCacheWrapper",
    "BatchMLAPagedAttentionWrapper",
    "MultiLevelCascadeAttentionWrapper",
    "PODWithPagedKVCacheWrapper",
    "BlockSparseAttentionWrapper",
    "VariableBlockSparseAttentionWrapper",
    "single_prefill_with_kv_cache",
    "single_decode_with_kv_cache",
    "AttentionVariant",
    "DefaultAttention",
    "FlashSigmoid",
    "make_default_variant",
    "merge_state",
    "merge_state_in_place",
    "merge_states",
    "variable_length_merge_states",
    # page
    "append_paged_kv_cache",
    "append_paged_mla_kv_cache",
    "get_batch_indices_positions",
    "get_seq_lens",
    "block_sparse_indices_to_vector_sparse_offsets",
    # ops
    "silu_and_mul",
    "gelu_and_mul",
    "gelu_tanh_and_mul",
    "rmsnorm",
    "fused_add_rmsnorm",
    "gemma_rmsnorm",
    "gemma_fused_add_rmsnorm",
    "apply_rope",
    "apply_rope_pos_ids",
    "apply_llama31_rope",
    "apply_llama31_rope_pos_ids",
    "apply_rope_with_cos_sin_cache",
    "packbits",
    "segment_packbits",
    "SegmentGEMMWrapper",
    "bmm_fp8",
    "mm_fp4",
    "gemm_fp8_nt_groupwise",
    "group_gemm_fp8_nt_groupwise",
    # sampling
    "softmax",
    "sampling_from_probs",
    "sampling_from_logits",
    "top_p_sampling_from_probs",
    "top_k_sampling_from_probs",
    "min_p_sampling_from_probs",
    "top_k_top_p_sampling_from_probs",
    "top_k_top_p_sampling_from_logits",
    "top_p_renorm_probs",
    "top_k_renorm_probs",
    "top_k_mask_logits",
    "chain_speculative_sampling",
]
