"""LogitsPipe DSL tests (reference: tests/utils/test_logits_processor.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.logits_processor import (
    LogitsPipe,
    MinP,
    Sample,
    Softmax,
    TaggedTensor,
    Temperature,
    TensorType,
    TopK,
    TopP,
)


def _logits(rng, b=4, v=32):
    return jnp.asarray(rng.standard_normal((b, v)) * 3, jnp.float32)


def test_pipe_fusion_names():
    pipe = LogitsPipe([Temperature(), Softmax(), TopK(), TopP(), Sample()])
    assert pipe.compiled_names == ["temperature", "softmax",
                                   "fused_topk_topp_sample"]
    pipe2 = LogitsPipe([Softmax(), Sample()])
    assert pipe2.compiled_names == ["fused_softmax_sample"]
    pipe3 = LogitsPipe([Softmax(), TopP(), Sample()])
    assert pipe3.compiled_names == ["softmax", "fused_topp_sample"]


def test_pipe_topk_topp_sample_membership():
    rng = np.random.default_rng(0)
    logits = _logits(rng)
    pipe = LogitsPipe([Temperature(), Softmax(), TopK(), TopP(), Sample()])
    ids = pipe(logits, temperature=1.0, top_k=5, top_p=0.9,
               key=jax.random.key(0))
    probs = np.asarray(jax.nn.softmax(logits, -1))
    for t in range(logits.shape[0]):
        top5 = set(np.argsort(-probs[t])[:5].tolist())
        assert int(ids[t]) in top5


def test_pipe_greedy_with_zero_temperature_topk1():
    rng = np.random.default_rng(1)
    logits = _logits(rng)
    pipe = LogitsPipe([Softmax(), TopK(), Sample()])
    ids = pipe(logits, top_k=1, key=jax.random.key(1))
    np.testing.assert_array_equal(
        np.asarray(ids), np.argmax(np.asarray(logits), -1)
    )


def test_pipe_topk_mask_on_logits():
    pipe = LogitsPipe([TopK(), Softmax(), Sample()])
    # TopK applied on LOGITS legalizes to mask; then fused softmax-sample
    assert pipe.compiled_names == ["topk_mask_logits", "fused_softmax_sample"]
    rng = np.random.default_rng(2)
    logits = _logits(rng)
    ids = pipe(logits, top_k=3, key=jax.random.key(2))
    for t in range(logits.shape[0]):
        top3 = set(np.argsort(-np.asarray(logits)[t])[:3].tolist())
        assert int(ids[t]) in top3


def test_pipe_probs_input():
    rng = np.random.default_rng(3)
    p = np.abs(rng.standard_normal((2, 8))).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    pipe = LogitsPipe([MinP(), Sample()], input_type=TensorType.PROBS)
    assert pipe.compiled_names == ["fused_minp_sample"]
    ids = pipe(TaggedTensor.probs(jnp.asarray(p)), min_p=0.2,
               key=jax.random.key(3))
    for t in range(2):
        assert p[t][int(ids[t])] >= 0.2 * p[t].max() - 1e-6


def test_pipe_type_validation():
    with pytest.raises(AssertionError):
        LogitsPipe([TopP(), Sample()])  # TopP needs PROBS, input is LOGITS


def test_pipe_constructor_params():
    rng = np.random.default_rng(4)
    logits = _logits(rng)
    pipe = LogitsPipe([Softmax(), TopK(top_k=2), Sample()])
    ids = pipe(logits, key=jax.random.key(4))
    for t in range(logits.shape[0]):
        top2 = set(np.argsort(-np.asarray(logits)[t])[:2].tolist())
        assert int(ids[t]) in top2
