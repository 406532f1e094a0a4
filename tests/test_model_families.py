"""DeepSeek-MLA and Mixtral-MoE model families: paged decode step vs the
dense oracle forward (greedy-token agreement and logits closeness)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.models.deepseek import (
    DeepSeekConfig,
    deepseek_decode_step,
    deepseek_forward_dense,
    deepseek_init_weights,
)
from flashinfer_tpu.models.mixtral import (
    MixtralConfig,
    mixtral_decode_step,
    mixtral_forward_dense,
    mixtral_init_weights,
)
from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper
from flashinfer_tpu.ops.attention.batch import BatchDecodeWithPagedKVCacheWrapper
from flashinfer_tpu.ops.page import append_paged_kv_cache, append_paged_mla_kv_cache
from flashinfer_tpu.scheduler.native import PagePool


def _page_tables(pool, seqs):
    indptr, indices, last = pool.batch_export(seqs)
    return (
        jnp.asarray(indices),
        jnp.asarray(indptr.astype(np.int32)),
        jnp.asarray(last.astype(np.int32)),
    )


def test_deepseek_decode_matches_dense():
    cfg = DeepSeekConfig.tiny()
    params = deepseek_init_weights(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S, PS = 2, 4, 4
    prompts = rng.integers(0, cfg.vocab_size, (B, S))

    # dense oracle over prompt + verify next-token logits at the last pos
    logits_dense = deepseek_forward_dense(
        params, jnp.asarray(prompts, jnp.int32), cfg)

    # paged: prefill the (ckv, kpe) caches token by token via decode steps
    pool = PagePool(num_pages=16, page_size=PS)
    seqs = [pool.create() for _ in range(B)]
    L = cfg.num_layers
    ckv = jnp.zeros((L, 16, PS, cfg.head_dim_ckv), jnp.float32)
    kpe = jnp.zeros((L, 16, PS, cfg.head_dim_kpe), jnp.float32)
    sm_scale = 1.0 / math.sqrt(cfg.head_dim_qk_nope + cfg.head_dim_kpe)

    logits = None
    for t in range(S):
        for s in seqs:
            pool.extend(s, t + 1)
        kv_indices, kv_indptr, kv_last = _page_tables(pool, seqs)
        w = BatchMLAPagedAttentionWrapper(backend="pallas")
        w.plan(
            np.arange(B + 1), np.asarray(kv_indptr), np.asarray(kv_indices),
            np.full(B, t + 1), cfg.num_heads, cfg.head_dim_ckv,
            cfg.head_dim_kpe, PS, causal=False, sm_scale=sm_scale,
        )
        logits, ckv, kpe = deepseek_decode_step(
            params, cfg, jnp.asarray(prompts[:, t], jnp.int32),
            jnp.full((B,), t, jnp.int32), ckv, kpe,
            kv_indices, kv_indptr, kv_last, w, interpret=True,
        )

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_dense[:, -1]),
        rtol=2e-4, atol=2e-4,
    )
    assert np.array_equal(
        np.argmax(np.asarray(logits), -1),
        np.argmax(np.asarray(logits_dense[:, -1]), -1),
    )


def test_deepseek_fp8_decode_close_to_bf16():
    """FP8 MLA serving end to end: int8-container ckv/kpe caches + the fused
    mla_rope_quantize_fp8 prologue vs the same decode steps on f32 caches.
    (reference config 4 + fp8: decode.py:2298 + mla.py:179)."""
    from flashinfer_tpu.ops.rope import rope_cos_sin_cache

    cfg = DeepSeekConfig.tiny()
    params = deepseek_init_weights(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    B, S, PS = 2, 4, 4
    prompts = rng.integers(0, cfg.vocab_size, (B, S))
    L = cfg.num_layers
    sm_scale = 1.0 / math.sqrt(cfg.head_dim_qk_nope + cfg.head_dim_kpe)
    kv_scale = 0.25
    cos_sin = rope_cos_sin_cache(64, cfg.head_dim_kpe,
                                 rope_theta=cfg.rope_theta)

    def run(fp8: bool):
        pool = PagePool(num_pages=16, page_size=PS)
        seqs = [pool.create() for _ in range(B)]
        dt = jnp.int8 if fp8 else jnp.float32
        ckv = jnp.zeros((L, 16, PS, cfg.head_dim_ckv), dt)
        kpe = jnp.zeros((L, 16, PS, cfg.head_dim_kpe), dt)
        logits = None
        for t in range(S):
            for s in seqs:
                pool.extend(s, t + 1)
            kv_indices, kv_indptr, kv_last = _page_tables(pool, seqs)
            w = BatchMLAPagedAttentionWrapper(backend="pallas")
            w.plan(
                np.arange(B + 1), np.asarray(kv_indptr),
                np.asarray(kv_indices), np.full(B, t + 1), cfg.num_heads,
                cfg.head_dim_ckv, cfg.head_dim_kpe, PS, causal=False,
                sm_scale=sm_scale,
            )
            logits, ckv, kpe = deepseek_decode_step(
                params, cfg, jnp.asarray(prompts[:, t], jnp.int32),
                jnp.full((B,), t, jnp.int32), ckv, kpe,
                kv_indices, kv_indptr, kv_last, w, interpret=True,
                kv_scale=kv_scale if fp8 else 1.0,
                cos_sin_cache=cos_sin if fp8 else None,
            )
        return np.asarray(logits)

    lo_fp8 = run(True)
    lo_bf16 = run(False)
    # e4m3 cache quantization noise bounds the logit delta
    np.testing.assert_allclose(lo_fp8, lo_bf16, rtol=0.1, atol=0.1)


def test_mixtral_decode_matches_dense():
    cfg = MixtralConfig.tiny()
    params = mixtral_init_weights(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    B, S, PS = 2, 4, 4
    prompts = rng.integers(0, cfg.vocab_size, (B, S))

    logits_dense = mixtral_forward_dense(
        params, jnp.asarray(prompts, jnp.int32), cfg)

    pool = PagePool(num_pages=16, page_size=PS)
    seqs = [pool.create() for _ in range(B)]
    L = cfg.num_layers
    kc = jnp.zeros((L, 16, PS, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    vc = jnp.zeros_like(kc)

    logits = None
    for t in range(S):
        for s in seqs:
            pool.extend(s, t + 1)
        kv_indices, kv_indptr, kv_last = _page_tables(pool, seqs)
        w = BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD",
                                               backend="pallas")
        w.plan(
            np.asarray(kv_indptr), np.asarray(kv_indices),
            np.asarray(kv_last), cfg.num_qo_heads, cfg.num_kv_heads,
            cfg.head_dim, PS,
        )
        logits, (kc, vc) = mixtral_decode_step(
            params, cfg, jnp.asarray(prompts[:, t], jnp.int32),
            jnp.full((B,), t, jnp.int32), (kc, vc),
            kv_indices, kv_indptr, kv_last, w, interpret=True,
        )

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_dense[:, -1]),
        rtol=2e-4, atol=2e-4,
    )
    assert np.array_equal(
        np.argmax(np.asarray(logits), -1),
        np.argmax(np.asarray(logits_dense[:, -1]), -1),
    )


def test_deepseek_dense_runs_bf16():
    cfg = DeepSeekConfig.tiny(dtype=jnp.bfloat16)
    params = deepseek_init_weights(jax.random.key(2), cfg)
    logits = deepseek_forward_dense(
        params, jnp.zeros((1, 4), jnp.int32), cfg)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_mixtral_moe_layer_ep_sharded():
    """Mixtral's MoE FFN composed with the EP-sharded layer equals the
    single-device path (model family x parallel composition, SURVEY §2.5)."""
    import numpy as np
    from jax.sharding import Mesh

    from flashinfer_tpu.models.mixtral import (
        MixtralConfig,
        mixtral_init_weights,
    )
    from flashinfer_tpu.ops.fused_moe import (
        RoutingMethodType,
        fused_moe,
        route_tokens,
    )
    from flashinfer_tpu.parallel import fused_moe_ep

    cfg = MixtralConfig.tiny()
    params = mixtral_init_weights(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    tokens = 16
    xn = jnp.asarray(rng.standard_normal((tokens, cfg.hidden_size)) * 0.3,
                     jnp.float32)
    logits = xn @ params["router"][0].astype(jnp.float32)

    ids, scales = route_tokens(logits, cfg.top_k,
                               RoutingMethodType.Renormalize)
    ref = fused_moe(xn, params["w13"][0], params["w2"][0], ids, scales)

    ep = min(4, cfg.num_experts)
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    out = fused_moe_ep(
        xn, logits, params["w13"][0], params["w2"][0], mesh,
        top_k=cfg.top_k, routing_method=RoutingMethodType.Renormalize,
        capacity=tokens * cfg.top_k,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
