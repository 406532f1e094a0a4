"""Native C++ planner vs NumPy planner: exact-agreement property tests,
plus page-pool allocator behavior (csrc/planner.cc, csrc/page_pool.cc)."""

import numpy as np
import pytest

from flashinfer_tpu.scheduler.native import (
    PagePool,
    native_plan_attention,
    native_plan_available,
)
from flashinfer_tpu.scheduler.plan import _plan_attention_numpy

needs_native = pytest.mark.skipif(
    not native_plan_available(), reason="native runtime not buildable"
)


def _compare(plan_a, plan_b):
    assert plan_a.tile_q == plan_b.tile_q
    assert plan_a.kv_chunk_size == plan_b.kv_chunk_size
    assert plan_a.num_work_items == plan_b.num_work_items
    assert plan_a.total_rows == plan_b.total_rows
    assert plan_a.num_valid_items == plan_b.num_valid_items
    for name in (
        "request_indices qo_tile_indices kv_tile_indices qo_start_row "
        "qo_tile_len kv_start kv_end kv_page_start num_kv_splits q_pos_base "
        "merge_out_row"
    ).split():
        np.testing.assert_array_equal(
            getattr(plan_a, name), getattr(plan_b, name), err_msg=name
        )


@needs_native
@pytest.mark.parametrize("seed", range(8))
def test_native_matches_numpy_random(seed):
    rng = np.random.default_rng(seed)
    batch = int(rng.integers(1, 12))
    tile_q = int(rng.choice([8, 16, 64, 128]))
    group = int(rng.choice([1, 2, 4, 8]))
    causal = bool(rng.integers(0, 2))
    page_size = int(rng.choice([1, 16, 32]))

    tok_lens = rng.integers(0, 700, batch)
    rows = ((tok_lens * group + tile_q - 1) // tile_q) * tile_q
    qo_indptr = np.concatenate([[0], np.cumsum(rows)])
    kv_lens = tok_lens + rng.integers(0, 900, batch)
    pages = -(-np.maximum(kv_lens, 1) // page_size)
    kv_indptr = np.concatenate([[0], np.cumsum(pages)])

    kwargs = dict(
        qo_token_lens=tok_lens,
        gqa_group=group,
        kv_indptr=kv_indptr,
        page_size=page_size,
        tile_q=tile_q,
        causal=causal,
    )
    _compare(
        native_plan_attention(qo_indptr, kv_lens, **kwargs),
        _plan_attention_numpy(qo_indptr, kv_lens, **kwargs),
    )


@needs_native
def test_native_matches_numpy_decode_and_chunks():
    batch = 16
    qo_indptr = np.arange(batch + 1) * 8
    kv_lens = np.asarray([1, 17, 4096, 33, 1000, 2048, 5, 9999] * 2)
    for chunk in (None, 512, 4096):
        kwargs = dict(
            qo_token_lens=np.ones(batch, np.int64),
            gqa_group=4,
            kv_indptr=np.concatenate([[0], np.cumsum(-(-kv_lens // 32))]),
            page_size=32,
            tile_q=8,
            kv_chunk_size=chunk,
            causal=False,
        )
        _compare(
            native_plan_attention(qo_indptr, kv_lens, **kwargs),
            _plan_attention_numpy(qo_indptr, kv_lens, **kwargs),
        )


@needs_native
def test_native_empty_batch():
    plan_n = native_plan_attention(np.zeros(1, np.int64), np.zeros(0, np.int64))
    plan_p = _plan_attention_numpy(np.zeros(1, np.int64), np.zeros(0, np.int64))
    _compare(plan_n, plan_p)
    assert plan_n.num_valid_items == 0


def test_page_pool_basic():
    pool = PagePool(num_pages=10, page_size=16)
    a = pool.create()
    assert pool.extend(a, 40)  # 3 pages
    assert pool.seq_len(a) == 40
    assert len(pool.pages(a)) == 3
    assert pool.free_pages == 7
    b = pool.create()
    assert pool.extend(b, 16 * 7)
    assert pool.free_pages == 0
    assert not pool.extend(a, 48 + 16)  # OOM; unchanged
    assert pool.seq_len(a) == 40
    pool.release(b)
    assert pool.free_pages == 7
    assert pool.extend(a, 64)

    indptr, indices, last = pool.batch_export([a])
    assert list(indptr) == [0, 4]
    assert last[0] == 16  # 64 % 16 == 0 -> full last page
    assert len(set(indices.tolist())) == 4

    c = pool.create()
    assert pool.extend(c, 1)
    indptr, indices, last = pool.batch_export([a, c])
    assert list(indptr) == [0, 4, 5]
    assert last[1] == 1


def test_page_pool_reuse_released_pages():
    pool = PagePool(num_pages=4, page_size=8)
    s = pool.create()
    assert pool.extend(s, 32)
    first_pages = set(pool.pages(s).tolist())
    pool.release(s)
    t = pool.create()
    assert pool.extend(t, 32)
    assert set(pool.pages(t).tolist()) == first_pages


def test_page_pool_truncate():
    """Spec-decode rollback: truncate shrinks a sequence and returns the
    tail pages to the free list (native + Python fallback parity)."""
    pool = PagePool(num_pages=8, page_size=4)
    s = pool.create()
    assert pool.extend(s, 14)  # 4 pages
    free0 = pool.free_pages
    pages_before = pool.pages(s).tolist()
    pool.truncate(s, 5)  # back to 2 pages
    assert pool.seq_len(s) == 5
    assert pool.pages(s).tolist() == pages_before[:2]
    assert pool.free_pages == free0 + 2
    # truncate to 0 keeps the sequence alive with no pages
    pool.truncate(s, 0)
    assert pool.seq_len(s) == 0
    assert pool.free_pages == free0 + 4
    # growing past the old length still works after a truncate
    assert pool.extend(s, 9)
    assert pool.seq_len(s) == 9
    indptr, indices, last = pool.batch_export([s])
    assert indptr.tolist() == [0, 3] and last.tolist() == [1]
