"""Paged KV-cache op tests (reference: tests around flashinfer/page.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu import (
    append_paged_kv_cache,
    append_paged_mla_kv_cache,
    get_batch_indices_positions,
    get_seq_lens,
)


def _make_page_table(rng, seq_lens, page_size, num_total_pages):
    pages_needed = [-(-s // page_size) if s else 0 for s in seq_lens]
    indptr = np.concatenate([[0], np.cumsum(pages_needed)]).astype(np.int32)
    perm = rng.permutation(num_total_pages)[: indptr[-1]].astype(np.int32)
    last_len = np.array(
        [s - (p - 1) * page_size if p else 0 for s, p in zip(seq_lens, pages_needed)],
        np.int32,
    )
    return indptr, perm, last_len


def test_get_seq_lens():
    indptr = jnp.asarray([0, 2, 2, 5], jnp.int32)
    last = jnp.asarray([3, 0, 4], jnp.int32)
    lens = get_seq_lens(indptr, last, page_size=16)
    np.testing.assert_array_equal(np.asarray(lens), [16 + 3, 0, 2 * 16 + 4])


def test_get_batch_indices_positions():
    # two requests appending 3 and 2 tokens; seq lens after append 10 and 7
    append_indptr = jnp.asarray([0, 3, 5], jnp.int32)
    seq_lens = jnp.asarray([10, 7], jnp.int32)
    b, p = get_batch_indices_positions(append_indptr, seq_lens, 5)
    np.testing.assert_array_equal(np.asarray(b), [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(p), [7, 8, 9, 5, 6])


@pytest.mark.parametrize("layout", ["NHD", "HND"])
@pytest.mark.parametrize("as_tuple", [True, False])
def test_append_paged_kv_cache_roundtrip(layout, as_tuple):
    rng = np.random.default_rng(0)
    page_size, heads, dim = 4, 2, 8
    seq_lens = [6, 1, 9]  # final lengths after appending everything
    num_pages = 16
    indptr, indices, last_len = _make_page_table(rng, seq_lens, page_size, num_pages)

    nnz = sum(seq_lens)
    append_indptr = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    k_new = rng.standard_normal((nnz, heads, dim), dtype=np.float32)
    v_new = rng.standard_normal((nnz, heads, dim), dtype=np.float32)

    if layout == "NHD":
        shape = (num_pages, page_size, heads, dim)
    else:
        shape = (num_pages, heads, page_size, dim)
    k_cache = jnp.zeros(shape, jnp.float32)
    v_cache = jnp.zeros(shape, jnp.float32)
    cache = (k_cache, v_cache) if as_tuple else jnp.stack([k_cache, v_cache], 1)

    b, p = get_batch_indices_positions(
        jnp.asarray(append_indptr), jnp.asarray(seq_lens, jnp.int32), nnz
    )
    out = append_paged_kv_cache(
        jnp.asarray(k_new),
        jnp.asarray(v_new),
        b,
        p,
        cache,
        jnp.asarray(indices),
        jnp.asarray(indptr),
        jnp.asarray(last_len),
        kv_layout=layout,
    )
    if as_tuple:
        k_out, v_out = (np.asarray(x) for x in out)
    else:
        k_out, v_out = np.asarray(out[:, 0]), np.asarray(out[:, 1])
    if layout == "HND":
        k_out = k_out.swapaxes(1, 2)
        v_out = v_out.swapaxes(1, 2)

    # gather back token by token and compare
    for r in range(len(seq_lens)):
        for t in range(seq_lens[r]):
            page = indices[indptr[r] + t // page_size]
            got_k = k_out[page, t % page_size]
            want_k = k_new[append_indptr[r] + t]
            np.testing.assert_allclose(got_k, want_k, rtol=1e-6)
            got_v = v_out[page, t % page_size]
            want_v = v_new[append_indptr[r] + t]
            np.testing.assert_allclose(got_v, want_v, rtol=1e-6)


def test_append_with_padding_valid_mask():
    rng = np.random.default_rng(1)
    page_size, heads, dim = 2, 1, 4
    indptr = jnp.asarray([0, 1], jnp.int32)
    indices = jnp.asarray([3], jnp.int32)
    last = jnp.asarray([1], jnp.int32)
    cache = (
        jnp.full((4, page_size, heads, dim), -1.0),
        jnp.full((4, page_size, heads, dim), -1.0),
    )
    k_new = jnp.asarray(rng.standard_normal((2, heads, dim)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((2, heads, dim)), jnp.float32)
    b = jnp.asarray([0, 0], jnp.int32)
    p = jnp.asarray([0, 0], jnp.int32)  # second row is padding (would clobber)
    valid = jnp.asarray([True, False])
    k_out, v_out = append_paged_kv_cache(
        k_new, v_new, b, p, cache, indices, indptr, last, valid=valid
    )
    np.testing.assert_allclose(np.asarray(k_out[3, 0]), np.asarray(k_new[0]), rtol=1e-6)
    # untouched slots keep their value
    assert np.all(np.asarray(k_out[0]) == -1.0)


def test_append_paged_mla_kv_cache():
    rng = np.random.default_rng(2)
    page_size, ckv_dim, kpe_dim = 4, 16, 8
    seq_lens = [5, 3]
    indptr, indices, last = _make_page_table(rng, seq_lens, page_size, 8)
    nnz = sum(seq_lens)
    append_indptr = np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int32)
    ckv = rng.standard_normal((nnz, ckv_dim), dtype=np.float32)
    kpe = rng.standard_normal((nnz, kpe_dim), dtype=np.float32)
    b, p = get_batch_indices_positions(
        jnp.asarray(append_indptr), jnp.asarray(seq_lens, jnp.int32), nnz
    )
    ckv_cache = jnp.zeros((8, page_size, ckv_dim))
    kpe_cache = jnp.zeros((8, page_size, kpe_dim))
    ckv_out, kpe_out = append_paged_mla_kv_cache(
        jnp.asarray(ckv), jnp.asarray(kpe), b, p, ckv_cache, kpe_cache,
        jnp.asarray(indices), jnp.asarray(indptr), jnp.asarray(last),
    )
    for r in range(2):
        for t in range(seq_lens[r]):
            page = indices[indptr[r] + t // page_size]
            np.testing.assert_allclose(
                np.asarray(ckv_out[page, t % page_size]),
                ckv[append_indptr[r] + t],
                rtol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(kpe_out[page, t % page_size]),
                kpe[append_indptr[r] + t],
                rtol=1e-6,
            )
