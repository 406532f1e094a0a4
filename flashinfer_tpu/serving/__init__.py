"""Continuous-batching serving runtime (engine over the kernel library)."""

from flashinfer_tpu.serving.engine import (
    EngineConfig,
    GenerationRequest,
    LlamaServingEngine,
    calibrate_kv_scales,
    propose_ngram,
)

__all__ = ["EngineConfig", "GenerationRequest", "LlamaServingEngine",
           "calibrate_kv_scales", "propose_ngram"]
