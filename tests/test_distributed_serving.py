"""Distributed (dp x tp) serving engine vs the single-chip engine.

VERDICT round-1 item 2: multi-device continuous-batch paged decode is the
flagship path; greedy tokens must match the single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from flashinfer_tpu.models.llama import LlamaConfig
from flashinfer_tpu.serving import EngineConfig, LlamaServingEngine
from flashinfer_tpu.serving.distributed import DistributedServingEngine


def _tiny_cfg(**kw):
    mc = LlamaConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_qo_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        dtype=jnp.float32,
    )
    base = dict(model=mc, max_batch=2, num_pages=64, page_size=8,
                max_seq_len=128, greedy=True, interpret=True)
    base.update(kw)
    return EngineConfig(**base)


def _mesh(dp, tp):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


@pytest.mark.parametrize("dp,tp", [(2, 2), (1, 2), (2, 1)])
def test_distributed_matches_single_device(dp, tp):
    cfg = _tiny_cfg()
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12, 13, 14], [3, 1]]
    n_new = [6, 5, 4, 6]

    # single-device reference run
    ref = LlamaServingEngine(cfg, seed=0)
    ref_reqs = [ref.add_request(p, n) for p, n in zip(prompts, n_new)]
    ref.run_to_completion()

    dist = DistributedServingEngine(cfg, _mesh(dp, tp), seed=0)
    reqs = [dist.add_request(p, n) for p, n in zip(prompts, n_new)]
    dist.run_to_completion(max_steps=64)

    for rr, r in zip(ref_reqs, reqs):
        assert r.done
        assert r.output == rr.output, (r.output, rr.output)


def test_distributed_continuous_batching_admits_late():
    """A request queued beyond capacity is admitted when a slot frees."""
    cfg = _tiny_cfg(max_batch=1)
    dist = DistributedServingEngine(cfg, _mesh(1, 2), seed=0)
    a = dist.add_request([1, 2, 3], 3, replica=0)
    b = dist.add_request([4, 5], 3, replica=0)
    dist.run_to_completion(max_steps=64)
    assert a.done and b.done
    assert len(a.output) == 3 and len(b.output) == 3


def test_distributed_fp8_kv():
    cfg = _tiny_cfg(kv_dtype="fp8_e4m3", kv_scale=0.05)
    ref = LlamaServingEngine(cfg, seed=0)
    r1 = ref.add_request([1, 2, 3, 4], 4)
    ref.run_to_completion()
    dist = DistributedServingEngine(cfg, _mesh(2, 2), seed=0)
    r2 = dist.add_request([1, 2, 3, 4], 4, replica=0)
    dist.run_to_completion(max_steps=32)
    assert r2.done and len(r2.output) == 4
    assert r2.output == r1.output, (r2.output, r1.output)


def test_distributed_int8_kv():
    """Linear-int8 KV containers through the dp x tp SPMD engine match the
    single-device int8 engine token for token."""
    cfg = _tiny_cfg(kv_dtype="int8", kv_scale=0.05)
    ref = LlamaServingEngine(cfg, seed=0)
    r1 = ref.add_request([1, 2, 3, 4], 4)
    ref.run_to_completion()
    dist = DistributedServingEngine(cfg, _mesh(2, 2), seed=0)
    r2 = dist.add_request([1, 2, 3, 4], 4, replica=0)
    dist.run_to_completion(max_steps=32)
    assert r2.done and len(r2.output) == 4
    assert r2.output == r1.output, (r2.output, r1.output)
