"""Tensor-parallel paged decode over a mesh vs the dense oracle.

Runs the TP step token-by-token on a virtual 2- and 4-way 'tp' mesh and
checks final-token logits against llama_forward_dense."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from flashinfer_tpu.models.llama import (
    LlamaConfig,
    llama_forward_dense,
    llama_init_weights,
)
from flashinfer_tpu.ops.attention.batch import BatchDecodeWithPagedKVCacheWrapper
from flashinfer_tpu.parallel.tp_serving import (
    make_tp_decode_step,
    shard_llama_params_tp,
)
from flashinfer_tpu.scheduler.native import PagePool


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_dense(tp):
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    cfg = LlamaConfig.tiny()  # hq=4, hkv=2
    if cfg.num_kv_heads % tp:
        cfg = dataclasses.replace(cfg, num_qo_heads=8, num_kv_heads=4)
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    params = llama_init_weights(jax.random.key(0), cfg)
    params_tp = shard_llama_params_tp(params, mesh, cfg)

    rng = np.random.default_rng(0)
    B, S, PS, PAGES = 2, 4, 4, 16
    prompts = rng.integers(0, cfg.vocab_size, (B, S))
    logits_dense = llama_forward_dense(
        params, jnp.asarray(prompts, jnp.int32), cfg)

    pool = PagePool(num_pages=PAGES, page_size=PS)
    seqs = [pool.create() for _ in range(B)]
    L = cfg.num_layers
    hkv_l = cfg.num_kv_heads // tp
    kc = jnp.zeros((L, PAGES, PS, cfg.num_kv_heads, cfg.head_dim),
                   jnp.float32)
    vc = jnp.zeros_like(kc)
    step = make_tp_decode_step(mesh, cfg, interpret=True)

    logits = None
    for t in range(S):
        for s in seqs:
            pool.extend(s, t + 1)
        indptr, indices, last = pool.batch_export(seqs)
        w = BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD",
                                               backend="pallas")
        # plan with LOCAL head counts — identical on every device
        w.plan(indptr, indices, last, cfg.num_qo_heads // tp, hkv_l,
               cfg.head_dim, PS)
        with jax.set_mesh(mesh):
            logits, kc, vc = step(
                params_tp, kc, vc,
                jnp.asarray(prompts[:, t], jnp.int32),
                jnp.full((B,), t, jnp.int32),
                jnp.ones((B,), bool),
                jnp.asarray(indices), jnp.asarray(indptr.astype(np.int32)),
                jnp.asarray(last.astype(np.int32)),
                w.device_plan,
            )

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_dense[:, -1]),
        rtol=2e-4, atol=2e-4)
    assert np.array_equal(
        np.argmax(np.asarray(logits), -1),
        np.argmax(np.asarray(logits_dense[:, -1]), -1))
