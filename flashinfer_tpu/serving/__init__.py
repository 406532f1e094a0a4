"""Continuous-batching serving runtime (engine over the kernel library)."""

from flashinfer_tpu.serving.engine import (
    EngineConfig,
    GenerationRequest,
    LlamaServingEngine,
)

__all__ = ["EngineConfig", "GenerationRequest", "LlamaServingEngine"]
