"""Planner invariants (reference: scheduler.cuh PrefillPlan/DecodePlan)."""

import numpy as np
import pytest

from flashinfer_tpu.scheduler import plan_attention, plan_decode, plan_prefill


def _check_plan_covers(plan, qo_indptr, kv_lens, causal):
    """Every (row, kv token) pair that attention needs is covered exactly once."""
    qo_indptr = np.asarray(qo_indptr)
    kv_lens = np.asarray(kv_lens)
    g = plan.gqa_group
    covered = {}
    for w in range(plan.num_work_items):
        r = plan.request_indices[w]
        if r < 0:
            continue
        rows = range(
            plan.qo_start_row[w], plan.qo_start_row[w] + plan.qo_tile_len[w]
        )
        for row in rows:
            key = (r, row)
            covered.setdefault(key, []).append((plan.kv_start[w], plan.kv_end[w]))
    for r in range(len(kv_lens)):
        qo_len = qo_indptr[r + 1] - qo_indptr[r]
        for i in range(qo_len):
            row = qo_indptr[r] + i
            # token position of packed row i
            q_abs = kv_lens[r] - qo_len // g + i // g
            visible = min(q_abs + 1, kv_lens[r]) if causal else kv_lens[r]
            ranges = sorted(covered.get((r, row), []))
            # coverage must include [0, visible) with no overlap
            pos = 0
            for lo, hi in ranges:
                assert lo == pos, f"gap/overlap at req {r} row {row}: {ranges}"
                pos = hi
            assert pos >= visible, (
                f"req {r} row {row}: covered to {pos}, needs {visible}"
            )


@pytest.mark.parametrize("causal", [False, True])
def test_plan_prefill_coverage(causal):
    qo_indptr = [0, 100, 612, 612, 1000]
    kv_lens = [300, 512, 0, 4000]
    plan = plan_prefill(
        np.asarray(qo_indptr),
        np.asarray(kv_lens),
        kv_chunk_size=512,
        causal=causal,
    )
    _check_plan_covers(plan, qo_indptr, kv_lens, causal)


def test_plan_decode_splits_long_kv():
    kv_lens = np.asarray([16, 100000, 64])
    plan = plan_decode(kv_lens, kv_chunk_size=4096)
    # decode rows are padded: one tile_q-row tile per request
    _check_plan_covers(plan, np.arange(4) * plan.tile_q, kv_lens, causal=False)
    # the long request must be split
    items = plan.request_indices[: plan.num_valid_items]
    assert (items == 1).sum() == -(-100000 // 4096)
    # splits bookkeeping
    for w in range(plan.num_valid_items):
        r = plan.request_indices[w]
        assert plan.num_kv_splits[w] == (items == r).sum()


def test_plan_merge_map():
    qo_indptr = np.asarray([0, 5, 9])
    kv_lens = np.asarray([700, 100])
    plan = plan_attention(qo_indptr, kv_lens, tile_q=4, kv_chunk_size=256)
    # each output row appears in merge_out_row exactly num_splits times
    counts = np.zeros(9, int)
    for row in plan.merge_out_row:
        if row >= 0:
            counts[row] += 1
    # request 0: 700 kv -> 3 chunks; request 1: 1 chunk
    np.testing.assert_array_equal(counts[:5], 3)
    np.testing.assert_array_equal(counts[5:9], 1)


def test_plan_capacity_bucketing():
    p1 = plan_decode(np.asarray([128] * 3), kv_chunk_size=256)
    p2 = plan_decode(np.asarray([128] * 5), kv_chunk_size=256)
    # same bucket -> same static shapes -> jit cache hit
    assert p1.num_work_items == p2.num_work_items == 8


def test_plan_auto_chunk_size():
    # tiny batch, long kv: auto chunking should split to keep pipeline busy
    plan = plan_decode(np.asarray([32768]), max_kv_chunk_size=4096,
                       min_kv_chunk_size=256)
    assert plan.num_valid_items >= 8


def test_plan_page_alignment():
    plan = plan_decode(
        np.asarray([1000, 3]),
        kv_indptr=np.asarray([0, 63, 64]),
        page_size=16,
        kv_chunk_size=100,  # not page aligned -> rounded up
    )
    assert plan.kv_chunk_size % 16 == 0
    for w in range(plan.num_valid_items):
        assert plan.kv_start[w] % 16 == 0
        r = plan.request_indices[w]
        base = [0, 63][r]
        assert plan.kv_page_start[w] == base + plan.kv_start[w] // 16
