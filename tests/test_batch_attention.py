"""Batch paged/ragged attention wrappers: Pallas kernel vs reference path.

Mirrors the reference's tests/attention/test_batch_prefill_kernels.py /
test_batch_decode_kernels.py pattern (kernel vs python oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.batch import (
    BatchDecodeWithPagedKVCacheWrapper,
    BatchPrefillWithPagedKVCacheWrapper,
    BatchPrefillWithRaggedKVCacheWrapper,
)


def _page_table(rng, kv_lens, page_size, extra_pages=3):
    pages_needed = [-(-s // page_size) for s in kv_lens]
    total = sum(pages_needed) + extra_pages
    indptr = np.concatenate([[0], np.cumsum(pages_needed)]).astype(np.int32)
    indices = rng.permutation(total)[: indptr[-1]].astype(np.int32)
    last = np.asarray(
        [s - (p - 1) * page_size if p else 0 for s, p in zip(kv_lens, pages_needed)],
        np.int32,
    )
    return indptr, indices, last, total


def _fill_cache(rng, total_pages, kvh, page_size, d, dtype=np.float32):
    k = rng.standard_normal((total_pages, kvh, page_size, d)).astype(dtype)
    v = rng.standard_normal((total_pages, kvh, page_size, d)).astype(dtype)
    return jnp.asarray(k), jnp.asarray(v)


def _compare(w_kwargs, plan_args, plan_kwargs, q, cache, tol=2e-3, cls=None):
    cls = cls or BatchDecodeWithPagedKVCacheWrapper
    w_ref = cls(backend="reference", **w_kwargs)
    w_ref.plan(*plan_args, **plan_kwargs)
    ref, ref_lse = w_ref.run(q, cache, return_lse=True)

    w_pal = cls(backend="pallas", **w_kwargs)
    w_pal.plan(*plan_args, **plan_kwargs)
    out, lse = w_pal.run(q, cache, return_lse=True, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=tol, atol=tol
    )
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=tol, atol=tol)


@pytest.mark.parametrize("kv_lens", [[6, 9], [1, 33, 17]])
def test_batch_decode_paged(kv_lens):
    rng = np.random.default_rng(0)
    page_size, kvh, hq, d = 4, 2, 4, 32
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    q = jnp.asarray(
        rng.standard_normal((len(kv_lens), hq, d)), jnp.float32
    )
    _compare(
        dict(kv_layout="HND", tile_k=16),
        (indptr, indices, last, hq, kvh, d, page_size),
        dict(kv_chunk_size=16),
        q,
        (k, v),
    )


def test_batch_decode_split_kv():
    """Long kv split across work items exercises the merge path."""
    rng = np.random.default_rng(1)
    page_size, kvh, hq, d = 8, 1, 2, 32
    kv_lens = [75]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    q = jnp.asarray(rng.standard_normal((1, hq, d)), jnp.float32)
    _compare(
        dict(kv_layout="HND", tile_k=16),
        (indptr, indices, last, hq, kvh, d, page_size),
        dict(kv_chunk_size=32),  # 75 tokens -> 3 chunks
        q,
        (k, v),
    )


@pytest.mark.parametrize("causal", [False, True])
def test_batch_prefill_paged(causal):
    rng = np.random.default_rng(2)
    page_size, kvh, hq, d = 8, 2, 4, 32
    kv_lens = [40, 17]
    qo_lens = [40, 9]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    q = jnp.asarray(rng.standard_normal((sum(qo_lens), hq, d)), jnp.float32)
    _compare(
        dict(kv_layout="HND", tile_q=16, tile_k=16),
        (qo_indptr, indptr, indices, last, hq, kvh, d, page_size),
        dict(causal=causal, kv_chunk_size=32),
        q,
        (k, v),
        cls=BatchPrefillWithPagedKVCacheWrapper,
    )


def test_batch_prefill_nhd_layout():
    rng = np.random.default_rng(3)
    page_size, kvh, hq, d = 4, 2, 2, 32
    kv_lens = [12, 20]
    qo_lens = [4, 8]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    # NHD layout: [pages, page_size, kvh, d]
    k_nhd = jnp.swapaxes(k, 1, 2)
    v_nhd = jnp.swapaxes(v, 1, 2)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    q = jnp.asarray(rng.standard_normal((sum(qo_lens), hq, d)), jnp.float32)
    _compare(
        dict(kv_layout="NHD", tile_q=8, tile_k=8),
        (qo_indptr, indptr, indices, last, hq, kvh, d, page_size),
        dict(causal=True, kv_chunk_size=16),
        q,
        (k_nhd, v_nhd),
        cls=BatchPrefillWithPagedKVCacheWrapper,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_batch_prefill_ragged(causal):
    rng = np.random.default_rng(4)
    kvh, hq, d = 2, 4, 32
    kv_lens = [30, 25]
    qo_lens = [16, 25]
    kv_indptr = np.concatenate([[0], np.cumsum(kv_lens)])
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    q = jnp.asarray(rng.standard_normal((sum(qo_lens), hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((sum(kv_lens), kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((sum(kv_lens), kvh, d)), jnp.float32)
    _compare(
        dict(tile_q=16, tile_k=16),
        (qo_indptr, kv_indptr, hq, kvh, d),
        dict(causal=causal, kv_chunk_size=32),
        q,
        (k, v),
        cls=BatchPrefillWithRaggedKVCacheWrapper,
    )


def test_batch_decode_sliding_window():
    rng = np.random.default_rng(5)
    page_size, kvh, hq, d = 4, 1, 2, 32
    kv_lens = [29, 13]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    q = jnp.asarray(rng.standard_normal((2, hq, d)), jnp.float32)
    _compare(
        dict(kv_layout="HND", tile_k=8),
        (indptr, indices, last, hq, kvh, d, page_size),
        dict(kv_chunk_size=16, window_left=7),
        q,
        (k, v),
    )


def test_batch_prefill_soft_cap():
    rng = np.random.default_rng(6)
    page_size, kvh, hq, d = 4, 1, 2, 32
    kv_lens = [16]
    qo_lens = [16]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    q = jnp.asarray(rng.standard_normal((16, hq, d)), jnp.float32)
    _compare(
        dict(kv_layout="HND", tile_q=8, tile_k=8),
        (qo_indptr, indptr, indices, last, hq, kvh, d, page_size),
        dict(causal=True, kv_chunk_size=16, logits_soft_cap=10.0),
        q,
        (k, v),
        cls=BatchPrefillWithPagedKVCacheWrapper,
    )
