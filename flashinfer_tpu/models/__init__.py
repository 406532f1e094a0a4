from flashinfer_tpu.models.llama import (
    LlamaConfig,
    llama_decode_step,
    llama_forward_dense,
    llama_init_weights,
)

__all__ = [
    "LlamaConfig",
    "llama_init_weights",
    "llama_forward_dense",
    "llama_decode_step",
]
