"""Block-sparse + POD wrapper tests (reference: tests/attention/
test_block_sparse.py, test_pod_kernels.py patterns)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.pod import PODWithPagedKVCacheWrapper
from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.attention.sparse import (
    BlockSparseAttentionWrapper,
    VariableBlockSparseAttentionWrapper,
)


def _bsr_oracle(q, k, v, indptr, indices, R, C):
    """Dense attention with the BSR mask."""
    M, hq, d = q.shape
    N = k.shape[0]
    mask = np.zeros((M, N), bool)
    for rb in range(len(indptr) - 1):
        for e in range(indptr[rb], indptr[rb + 1]):
            cb = indices[e]
            mask[rb * R : (rb + 1) * R, cb * C : (cb + 1) * C] = True
    out, _ = attention_reference(q, k, v, custom_mask=jnp.asarray(mask))
    return out


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_block_sparse_matches_masked_dense(backend):
    rng = np.random.default_rng(0)
    M, N, R, C, hq, hkv, d = 16, 32, 4, 8, 2, 1, 32
    indptr = np.asarray([0, 2, 3, 5, 6])
    indices = np.asarray([0, 2, 1, 0, 3, 2])
    q = jnp.asarray(rng.standard_normal((M, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)
    w = BlockSparseAttentionWrapper(backend=backend, tile_q=8, tile_k=8)
    w.plan(indptr, indices, M, N, R, C, hq, hkv, d, kv_chunk_size=16)
    kwargs = dict(interpret=True) if backend == "pallas" else {}
    out = w.run(q, k, v, **kwargs)
    want = _bsr_oracle(q, k, v, indptr, indices, R, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_variable_block_sparse():
    rng = np.random.default_rng(1)
    hq, hkv, d = 2, 1, 32
    block_row_sz = np.asarray([3, 5])
    block_col_sz = np.asarray([4, 2, 6])
    mask_map = np.asarray([[1, 0, 1], [0, 1, 1]], bool)
    M, N = block_row_sz.sum(), block_col_sz.sum()
    q = jnp.asarray(rng.standard_normal((M, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)
    w = VariableBlockSparseAttentionWrapper(backend="reference")
    w.plan(mask_map, block_row_sz, block_col_sz, hq, hkv, d)
    out = w.run(q, k, v)
    # dense oracle
    col_starts = np.concatenate([[0], np.cumsum(block_col_sz)])
    row_starts = np.concatenate([[0], np.cumsum(block_row_sz)])
    mask = np.zeros((M, N), bool)
    for rb in range(2):
        for cb in range(3):
            if mask_map[rb, cb]:
                mask[row_starts[rb]:row_starts[rb+1],
                     col_starts[cb]:col_starts[cb+1]] = True
    # NOTE: the planner gathers each row-block's kv tokens contiguously, so
    # the oracle must compare against the gathered order — attention is
    # permutation-invariant over kv, so the dense mask oracle still matches.
    want, _ = attention_reference(q, k, v, custom_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_pod_wrapper():
    rng = np.random.default_rng(2)
    hq, hkv, d, page_size = 2, 1, 32, 4
    # prefill part
    q_p = jnp.asarray(rng.standard_normal((8, hq, d)), jnp.float32)
    k_p = jnp.asarray(rng.standard_normal((8, hkv, d)), jnp.float32)
    v_p = jnp.asarray(rng.standard_normal((8, hkv, d)), jnp.float32)
    # decode part
    kv_lens = [6, 9]
    pages = [-(-s // page_size) for s in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages)])
    indices = rng.permutation(8)[: indptr[-1]].astype(np.int32)
    last = np.asarray([s - (p - 1) * page_size for s, p in zip(kv_lens, pages)])
    k_c = jnp.asarray(rng.standard_normal((8, hkv, page_size, d)), jnp.float32)
    v_c = jnp.asarray(rng.standard_normal((8, hkv, page_size, d)), jnp.float32)
    q_d = jnp.asarray(rng.standard_normal((2, hq, d)), jnp.float32)

    w = PODWithPagedKVCacheWrapper(backend="reference")
    w.plan(indptr, indices, last, hq, hkv, d, page_size)
    (p_out, d_out) = w.run(q_p, k_p, v_p, q_d, (k_c, v_c))
    ref_p, _ = attention_reference(q_p, k_p, v_p, causal=True)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(ref_p),
                               rtol=2e-4, atol=2e-4)
    assert d_out.shape == (2, hq, d)


def test_pod_single_launch_matches_two_call():
    """Combined-mode POD (one plan, ONE batch_paged_attention_run) equals
    the two-launch fallback."""
    rng = np.random.default_rng(5)
    hq, hkv, d, page_size = 4, 2, 32, 4
    qo_len, kv_len = 12, 12
    q_p = jnp.asarray(rng.standard_normal((qo_len, hq, d)), jnp.float32)
    k_p = jnp.asarray(rng.standard_normal((kv_len, hkv, d)), jnp.float32)
    v_p = jnp.asarray(rng.standard_normal((kv_len, hkv, d)), jnp.float32)
    kv_lens = [6, 9]
    pages = [-(-s // page_size) for s in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages)])
    indices = rng.permutation(8)[: indptr[-1]].astype(np.int32)
    last = np.asarray([s - (p - 1) * page_size for s, p in zip(kv_lens, pages)])
    num_pages = 16  # spare room for the prefill chunk's pages
    k_c = jnp.asarray(rng.standard_normal((num_pages, hkv, page_size, d)),
                      jnp.float32)
    v_c = jnp.asarray(rng.standard_normal((num_pages, hkv, page_size, d)),
                      jnp.float32)
    q_d = jnp.asarray(rng.standard_normal((2, hq, d)), jnp.float32)
    free_pages = [p for p in range(num_pages) if p not in set(indices)][
        : -(-kv_len // page_size)]

    w2 = PODWithPagedKVCacheWrapper(backend="pallas")
    w2.plan(indptr, indices, last, hq, hkv, d, page_size,
            kv_len_arr=np.asarray(kv_lens), kv_chunk_size=16)
    p_ref, d_ref = w2.run(q_p, k_p, v_p, q_d, (k_c, v_c))

    w1 = PODWithPagedKVCacheWrapper(backend="pallas")
    w1.plan(indptr, indices, last, hq, hkv, d, page_size,
            prefill_qo_len=qo_len, prefill_kv_len=kv_len,
            prefill_page_indices=free_pages,
            kv_len_arr=np.asarray(kv_lens), kv_chunk_size=16)
    (p_out, d_out), _cache = w1.run(q_p, k_p, v_p, q_d, (k_c, v_c))

    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_ref),
                               rtol=2e-4, atol=2e-4)
