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


# ---------------- custom masks (packbits) + multi-item scoring ----------------


def test_batch_prefill_packed_custom_mask():
    """Per-request packbits custom masks flow through plan into the kernel
    (reference prefill.py:1523 custom_mask -> mask_mode CUSTOM)."""
    rng = np.random.default_rng(21)
    hq, hkv, d, page_size = 4, 2, 64, 8
    qo_lens = [5, 13, 1]
    kv_lens = [24, 17, 9]
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    kv_indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    kc, vc = _fill_cache(rng, total, hkv, page_size, d)
    q = jnp.asarray(
        rng.standard_normal((qo_indptr[-1], hq, d)), jnp.float32)

    masks = [rng.random((qo, kv)) > 0.4 for qo, kv in zip(qo_lens, kv_lens)]
    flat = np.concatenate([m.ravel() for m in masks])
    packed = np.packbits(flat)  # big bitorder, reference quantization.py:57
    bit_indptr = np.concatenate(
        [[0], np.cumsum([qo * kv for qo, kv in zip(qo_lens, kv_lens)])])

    plan_args = (qo_indptr, kv_indptr, indices, last, hq, hkv, d, page_size)
    plan_kwargs = dict(kv_len_arr=np.asarray(kv_lens),
                       packed_custom_mask=packed, mask_indptr=bit_indptr)
    _compare({}, plan_args, plan_kwargs, q, (kc, vc),
             cls=BatchPrefillWithPagedKVCacheWrapper)


def test_batch_prefill_custom_mask_fp8_kv():
    """Custom mask + fp8 KV: mask columns are resampled at the packed
    decode's permuted offsets."""
    rng = np.random.default_rng(22)
    hq, hkv, d, page_size = 2, 1, 64, 32
    qo_lens = [4, 3]
    kv_lens = [64, 40]
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    kv_indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    kcf, vcf = _fill_cache(rng, total, hkv, page_size, d)
    kc = kcf.astype(jnp.float8_e4m3fn)
    vc = vcf.astype(jnp.float8_e4m3fn)
    q = jnp.asarray(
        rng.standard_normal((qo_indptr[-1], hq, d)), jnp.float32)
    masks = [rng.random((qo, kv)) > 0.3 for qo, kv in zip(qo_lens, kv_lens)]
    flat = np.concatenate([m.ravel() for m in masks])

    plan_args = (qo_indptr, kv_indptr, indices, last, hq, hkv, d, page_size)
    plan_kwargs = dict(kv_len_arr=np.asarray(kv_lens),
                       custom_mask=flat)
    _compare({}, plan_args, plan_kwargs, q, (kc, vc), tol=6e-2,
             cls=BatchPrefillWithPagedKVCacheWrapper)


def test_batch_prefill_multi_item_scoring():
    """Multi-item scoring (reference prefill.cuh:795): item-region queries
    attend to the shared prefix plus their own item only."""
    rng = np.random.default_rng(23)
    hq, hkv, d, page_size = 2, 2, 64, 8
    # one request: prefix 6, items of lengths 3, 2, 4 (delimiter-led)
    prefix = 6
    items = [3, 2, 4]
    tpos = []
    for ln in items:
        tpos.extend(range(ln))
    tpos.append(0)  # trailing delimiter
    kv_len = prefix + len(tpos)
    qo_len = kv_len  # full prompt scoring
    qo_indptr = np.asarray([0, qo_len])
    kv_indptr, indices, last, total = _page_table(rng, [kv_len], page_size)
    kc, vc = _fill_cache(rng, total, hkv, page_size, d)
    q = jnp.asarray(rng.standard_normal((qo_len, hq, d)), jnp.float32)

    plan_args = (qo_indptr, kv_indptr, indices, last, hq, hkv, d, page_size)
    plan_kwargs = dict(kv_len_arr=np.asarray([kv_len]), causal=True,
                       prefix_len_ptr=np.asarray([prefix]),
                       token_pos_in_items_ptr=np.asarray(tpos),
                       token_pos_in_items_len=len(tpos))
    _compare({}, plan_args, plan_kwargs, q, (kc, vc),
             cls=BatchPrefillWithPagedKVCacheWrapper)

    # cross-check one row against first principles: a query in item 2 must
    # ignore item 1's tokens but see the prefix and its own item
    w = BatchPrefillWithPagedKVCacheWrapper(backend="reference")
    w.plan(*plan_args, **plan_kwargs)
    m = w._state.host["req_masks"][0]
    p_item2 = prefix + items[0] + 1  # first real token of item 2
    assert m[p_item2, :prefix].all()          # sees prefix
    assert not m[p_item2, prefix:prefix + items[0]].any() or items[0] == 0


@pytest.mark.parametrize("fp8", [False, True])
def test_batch_prefill_head_loop(fp8, monkeypatch):
    """Prefill tiles (tile_q >= 256) route to the fori_loop-over-heads
    kernel body (one head's softmax temps live at a time -> every kv head
    resident per grid step). Asserts the loop body actually ran and matches
    the reference oracle, f32 and fp8-KV."""
    from flashinfer_tpu.ops.attention.kernels import paged

    seen = []
    orig = paged._finish_run

    def spy(*a, **kw):
        seen.append(kw.get("head_loop", False))
        return orig(*a, **kw)

    monkeypatch.setattr(paged, "_finish_run", spy)

    rng = np.random.default_rng(31)
    page_size, kvh, hq, d = 16, 4, 4, 32
    kv_lens = [300, 520]
    qo_lens = [260, 300]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    cache = (k.astype(jnp.float8_e4m3fn), v.astype(jnp.float8_e4m3fn)) \
        if fp8 else (k, v)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    q = jnp.asarray(rng.standard_normal((sum(qo_lens), hq, d)),
                    jnp.bfloat16 if fp8 else jnp.float32)
    _compare(
        dict(kv_layout="HND", tile_q=256),
        (qo_indptr, indptr, indices, last, hq, kvh, d, page_size),
        dict(causal=True, kv_chunk_size=1024),
        q,
        cache,
        tol=6e-2 if fp8 else 2e-3,
        cls=BatchPrefillWithPagedKVCacheWrapper,
    )
    assert any(seen), "head_loop body was not exercised"


def test_batch_prefill_head_loop_alibi_hook():
    """Variant hooks (ALiBi logits_transform with per-head head_idx) run
    inside the fori_loop-over-heads body: head_idx is computed from the
    TRACED loop index — covers the hook x head_loop interaction."""
    from flashinfer_tpu.ops.attention.variants import make_default_variant

    rng = np.random.default_rng(33)
    page_size, kvh, hq, d = 16, 2, 4, 32  # group = 2
    kv_lens = [290, 310]
    qo_lens = [280, 300]
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)
    k, v = _fill_cache(rng, total, kvh, page_size, d)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
    q = jnp.asarray(rng.standard_normal((sum(qo_lens), hq, d)), jnp.float32)
    var = make_default_variant(use_alibi=True)
    params = {"alibi_slopes": jnp.asarray([0.1, 0.3, 0.5, 0.7], jnp.float32)}
    _compare(
        dict(kv_layout="HND", tile_q=256, variant=var),
        (qo_indptr, indptr, indices, last, hq, kvh, d, page_size),
        dict(causal=True, kv_chunk_size=1024, variant_params=params),
        q,
        (k, v),
        cls=BatchPrefillWithPagedKVCacheWrapper,
    )


def test_kernel_probe_modes_run(monkeypatch):
    """FLASHINFER_TPU_KERNEL_PROBE instrumented builds (grid/dma/compute —
    the profiler.cuh-analogue decomposition harness) must keep tracing and
    running as the kernel evolves; probe=None must stay bit-identical to
    the production path."""
    import os

    import jax.numpy as jnp

    import flashinfer_tpu as fi

    rng = np.random.default_rng(3)
    B, HQ, HKV, D, PS = 2, 4, 2, 128, 16
    kv_lens = [37, 20]
    pages = [-(-l // PS) for l in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages)]).astype(np.int32)
    indices = np.arange(sum(pages), dtype=np.int32)
    last = np.asarray([l - (p - 1) * PS for l, p in zip(kv_lens, pages)],
                      np.int32)
    kc = jnp.asarray(rng.standard_normal((sum(pages) + 1, HKV, PS, D)),
                     jnp.float32)
    vc = jnp.asarray(rng.standard_normal((sum(pages) + 1, HKV, PS, D)),
                     jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)

    def run():
        w = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="HND",
                                                  backend="pallas")
        w.plan(indptr, indices, last, HQ, HKV, D, PS)
        return np.asarray(w.run(q, (kc, vc), interpret=True))

    base = run()
    for probe in ("grid", "dma", "compute"):
        monkeypatch.setenv("FLASHINFER_TPU_KERNEL_PROBE", probe)
        out = run()  # values are garbage by design; must trace + run
        assert out.shape == base.shape
    monkeypatch.delenv("FLASHINFER_TPU_KERNEL_PROBE")
    np.testing.assert_array_equal(run(), base)  # probe off == production
