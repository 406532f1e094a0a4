"""FP8 (e4m3) KV-cache attention: Pallas kernel with folded k/v scales vs
the dequantized-oracle reference (reference FP8 KV path: prefill.py/decode.py
run(..., k_scale, v_scale))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashinfer_tpu as fi

FP8 = jnp.float8_e4m3fn


def _build_cache(rng, total_pages, hkv, ps, d):
    k = rng.standard_normal((total_pages, ps, hkv, d)) * 0.5
    v = rng.standard_normal((total_pages, ps, hkv, d)) * 0.5
    k_scale, v_scale = 0.1, 0.07
    k_fp8 = jnp.asarray(k / k_scale, FP8)
    v_fp8 = jnp.asarray(v / v_scale, FP8)
    return k_fp8, v_fp8, k_scale, v_scale


@pytest.mark.parametrize("kv_lens", [[33, 7], [64]])
def test_fp8_decode_matches_dequant_reference(kv_lens):
    rng = np.random.default_rng(0)
    HQ, HKV, D, PS = 4, 2, 64, 32
    B = len(kv_lens)
    pages = [-(-l // PS) for l in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages)]).astype(np.int32)
    indices = np.arange(sum(pages), dtype=np.int32)
    last = np.asarray(
        [l - (p - 1) * PS for l, p in zip(kv_lens, pages)], np.int32)
    total_pages = sum(pages) + 2
    k8, v8, ks, vs = _build_cache(rng, total_pages, HKV, PS, D)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)

    wp = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD",
                                               backend="pallas")
    wp.plan(indptr, indices, last, HQ, HKV, D, PS)
    out_p = wp.run(q, (k8, v8), k_scale=ks, v_scale=vs, interpret=True)

    # oracle: dequantize to f32 then run the reference backend with unit scales
    k_deq = (k8.astype(jnp.float32) * ks).astype(jnp.bfloat16)
    v_deq = (v8.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    wr = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD",
                                               backend="reference")
    wr.plan(indptr, indices, last, HQ, HKV, D, PS)
    out_r = wr.run(q, (k_deq, v_deq))
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_r, np.float32),
        rtol=0.05, atol=0.05)


def test_fp8_prefill_matches_dequant_reference():
    rng = np.random.default_rng(1)
    HQ, HKV, D, PS = 4, 4, 64, 32
    kv_lens = [40, 16]
    qo_lens = [8, 16]
    B = 2
    pages = [-(-l // PS) for l in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages)]).astype(np.int32)
    indices = np.arange(sum(pages), dtype=np.int32)
    last = np.asarray(
        [l - (p - 1) * PS for l, p in zip(kv_lens, pages)], np.int32)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)
    total_pages = sum(pages) + 1
    k8, v8, ks, vs = _build_cache(rng, total_pages, HKV, PS, D)
    q = jnp.asarray(
        rng.standard_normal((sum(qo_lens), HQ, D)), jnp.bfloat16)

    wp = fi.BatchPrefillWithPagedKVCacheWrapper(kv_layout="NHD",
                                                backend="pallas")
    wp.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS, causal=True)
    out_p = wp.run(q, (k8, v8), k_scale=ks, v_scale=vs, interpret=True)

    k_deq = (k8.astype(jnp.float32) * ks).astype(jnp.bfloat16)
    v_deq = (v8.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    wr = fi.BatchPrefillWithPagedKVCacheWrapper(kv_layout="NHD",
                                                backend="reference")
    wr.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS, causal=True)
    out_r = wr.run(q, (k_deq, v_deq))
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_r, np.float32),
        rtol=0.05, atol=0.05)
