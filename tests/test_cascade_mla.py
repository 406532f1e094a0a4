"""Cascade + MLA wrappers vs oracle (reference: tests/attention/
test_shared_prefix_kernels.py / test_deepseek_mla.py patterns)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.cascade import MultiLevelCascadeAttentionWrapper
from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper
from flashinfer_tpu.ops.attention.reference import attention_reference


def _page_table(rng, kv_lens, page_size, total_pages):
    pages_needed = [-(-s // page_size) for s in kv_lens]
    indptr = np.concatenate([[0], np.cumsum(pages_needed)]).astype(np.int32)
    indices = rng.permutation(total_pages)[: indptr[-1]].astype(np.int32)
    last = np.asarray(
        [s - (p - 1) * page_size if p else 0 for s, p in zip(kv_lens, pages_needed)],
        np.int32,
    )
    return indptr, indices, last


def test_cascade_two_level_matches_flat_attention():
    """Two requests share a 16-token prefix; cascade(prefix level + suffix
    level) must equal flat attention over [prefix + suffix]."""
    rng = np.random.default_rng(0)
    page_size, kvh, hq, d = 4, 1, 2, 32
    prefix_len = 16
    suffix_lens = [8, 12]
    qo_lens = [8, 12]  # decode-append: qo == suffix for causal alignment

    total_pages = 24
    # one shared table: prefix pages then suffix pages
    all_lens = [prefix_len] + suffix_lens
    indptr_all, indices_all, last_all = _page_table(
        rng, all_lens, page_size, total_pages
    )
    k_cache = jnp.asarray(
        rng.standard_normal((total_pages, kvh, page_size, d)), jnp.float32
    )
    v_cache = jnp.asarray(
        rng.standard_normal((total_pages, kvh, page_size, d)), jnp.float32
    )

    nnz = sum(qo_lens)
    q = jnp.asarray(rng.standard_normal((nnz, hq, d)), jnp.float32)

    # level 0: both requests' queries attend the shared prefix (one group)
    qo_indptr_l0 = np.asarray([0, nnz])
    kv_indptr_l0 = np.asarray([0, indptr_all[1]])
    kv_indices_l0 = indices_all[: indptr_all[1]]
    last_l0 = np.asarray([last_all[0]])
    # level 1: each request attends its own suffix, causal
    qo_indptr_l1 = np.concatenate([[0], np.cumsum(qo_lens)])
    kv_indptr_l1 = (indptr_all[1:] - indptr_all[1]).astype(np.int32)
    kv_indices_l1 = indices_all[indptr_all[1] :]
    last_l1 = last_all[1:]

    wrapper = MultiLevelCascadeAttentionWrapper(2, kv_layout="HND",
                                                backend="reference")
    wrapper.plan(
        [qo_indptr_l0, qo_indptr_l1],
        [kv_indptr_l0, kv_indptr_l1],
        [kv_indices_l0, kv_indices_l1],
        [last_l0, last_l1],
        hq, kvh, d, page_size,
        causal=True,
    )
    out = wrapper.run(q, (k_cache, v_cache))

    # flat oracle per request: kv = prefix + suffix
    def gather(pages, length):
        k = k_cache[pages].transpose(0, 2, 1, 3).reshape(-1, kvh, d)[:length]
        v = v_cache[pages].transpose(0, 2, 1, 3).reshape(-1, kvh, d)[:length]
        return k, v

    k_pre, v_pre = gather(indices_all[: indptr_all[1]], prefix_len)
    ofs = 0
    for r, (slen, qlen) in enumerate(zip(suffix_lens, qo_lens)):
        pages_r = indices_all[indptr_all[r + 1] : indptr_all[r + 2]]
        k_suf, v_suf = gather(pages_r, slen)
        k_full = jnp.concatenate([k_pre, k_suf], 0)
        v_full = jnp.concatenate([v_pre, v_suf], 0)
        ref, _ = attention_reference(
            q[ofs : ofs + qlen], k_full, v_full, causal=True
        )
        np.testing.assert_allclose(
            np.asarray(out[ofs : ofs + qlen]), np.asarray(ref),
            rtol=2e-4, atol=2e-4,
        )
        ofs += qlen


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_mla_decode_matches_oracle(backend):
    rng = np.random.default_rng(1)
    page_size, heads, d_ckv, d_kpe = 4, 4, 64, 32  # small dims for CPU test
    kv_lens = [9, 22]
    batch = 2
    indptr, indices, last = _page_table(rng, kv_lens, page_size, 12)
    ckv_cache = jnp.asarray(
        rng.standard_normal((12, page_size, d_ckv)), jnp.float32
    )
    kpe_cache = jnp.asarray(
        rng.standard_normal((12, page_size, d_kpe)), jnp.float32
    )
    q_nope = jnp.asarray(rng.standard_normal((batch, heads, d_ckv)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((batch, heads, d_kpe)), jnp.float32)

    w = BatchMLAPagedAttentionWrapper(backend=backend, tile_k=8)
    qo_indptr = np.arange(batch + 1)
    w.plan(
        qo_indptr, indptr, indices, np.asarray(kv_lens), heads, d_ckv, d_kpe,
        page_size, sm_scale=1.0 / np.sqrt(d_ckv + d_kpe), kv_chunk_size=16,
    )
    kwargs = dict(interpret=True) if backend == "pallas" else {}
    out, lse = w.run(q_nope, q_pe, ckv_cache, kpe_cache, return_lse=True,
                     **kwargs)

    # oracle per request
    q = jnp.concatenate([q_nope, q_pe], -1)
    for r in range(batch):
        pages = indices[indptr[r] : indptr[r + 1]]
        ckv = ckv_cache[pages].reshape(-1, d_ckv)[: kv_lens[r]]
        kpe = kpe_cache[pages].reshape(-1, d_kpe)[: kv_lens[r]]
        k = jnp.concatenate([ckv, kpe], -1)[:, None, :]
        v = ckv[:, None, :]
        ref, ref_lse = attention_reference(
            q[r : r + 1], k, v, sm_scale=1.0 / np.sqrt(d_ckv + d_kpe)
        )
        np.testing.assert_allclose(
            np.asarray(out[r]), np.asarray(ref[0]), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(lse[r]), np.asarray(ref_lse[0]), rtol=2e-3, atol=2e-3
        )


def test_mla_prepadded_kpe_cache_zero_copy_path():
    """kpe stored already 128-lane padded (the documented zero-copy fast
    path, used by the MLA bench routine): run() must use the cache as-is
    and pad q_pe to the cache's width — regression for the double-pad bug
    that produced a 192-lane cache vs a 128-lane packed q_pe."""
    rng = np.random.default_rng(3)
    page_size, heads, d_ckv, d_kpe = 4, 4, 64, 32
    kv_lens = [9, 22]
    batch = 2
    indptr, indices, last = _page_table(rng, kv_lens, page_size, 12)
    ckv_cache = jnp.asarray(
        rng.standard_normal((12, page_size, d_ckv)), jnp.float32
    )
    kpe_raw = rng.standard_normal((12, page_size, d_kpe))
    kpe_padded = jnp.asarray(
        np.pad(kpe_raw, ((0, 0), (0, 0), (0, 128 - d_kpe))), jnp.float32
    )
    q_nope = jnp.asarray(rng.standard_normal((batch, heads, d_ckv)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((batch, heads, d_kpe)), jnp.float32)

    sm = 1.0 / np.sqrt(d_ckv + d_kpe)
    qo_indptr = np.arange(batch + 1)
    w = BatchMLAPagedAttentionWrapper(backend="pallas", tile_k=8)
    w.plan(qo_indptr, indptr, indices, np.asarray(kv_lens), heads, d_ckv,
           d_kpe, page_size, sm_scale=sm, kv_chunk_size=16)
    out = w.run(q_nope, q_pe, ckv_cache, kpe_padded, interpret=True)

    # oracle from the unpadded kpe
    q = jnp.concatenate([q_nope, q_pe], -1)
    for r in range(batch):
        pages = indices[indptr[r] : indptr[r + 1]]
        ckv = ckv_cache[pages].reshape(-1, d_ckv)[: kv_lens[r]]
        kpe = jnp.asarray(kpe_raw, jnp.float32)[pages].reshape(-1, d_kpe)[
            : kv_lens[r]]
        k = jnp.concatenate([ckv, kpe], -1)[:, None, :]
        ref, _ = attention_reference(q[r : r + 1], k, ckv[:, None, :],
                                     sm_scale=sm)
        np.testing.assert_allclose(
            np.asarray(out[r]), np.asarray(ref[0]), rtol=2e-3, atol=2e-3
        )


def test_mla_fp8_decode_matches_dequant_oracle():
    """FP8 (e4m3) MLA: int8-container ckv/kpe caches, in-kernel packed bit
    decode with 2^±60 scale folds (reference fp8 MLA:
    flashinfer/decode.py:2298 trtllm_batch_decode_with_kv_cache_mla +
    mla.py:179 mla_rope_quantize)."""
    rng = np.random.default_rng(7)
    page_size, heads, d_ckv, d_kpe = 4, 4, 64, 32
    kv_lens = [9, 22, 3]
    batch = 3
    indptr, indices, last = _page_table(rng, kv_lens, page_size, 12)
    ckv = rng.standard_normal((12, page_size, d_ckv)).astype(np.float32)
    kpe = rng.standard_normal((12, page_size, d_kpe)).astype(np.float32)
    ckv_scale, kpe_scale = 0.11, 0.07
    FP8 = jnp.float8_e4m3fn
    ckv8 = jax.lax.bitcast_convert_type(
        jnp.asarray(ckv / ckv_scale, FP8), jnp.int8)
    kpe8 = jax.lax.bitcast_convert_type(
        jnp.asarray(kpe / kpe_scale, FP8), jnp.int8)
    q_nope = jnp.asarray(rng.standard_normal((batch, heads, d_ckv)),
                         jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((batch, heads, d_kpe)),
                       jnp.float32)
    sm = 1.0 / np.sqrt(d_ckv + d_kpe)

    w = BatchMLAPagedAttentionWrapper(backend="pallas", tile_k=8)
    w.plan(np.arange(batch + 1), indptr, indices, np.asarray(kv_lens), heads,
           d_ckv, d_kpe, page_size, sm_scale=sm, kv_chunk_size=16)
    out, lse = w.run(q_nope, q_pe, ckv8, kpe8, return_lse=True,
                     interpret=True, ckv_scale=ckv_scale, kpe_scale=kpe_scale)

    # oracle: dequantize (through the same e4m3 round-trip) then bf16 math
    ckv_dq = np.asarray(jnp.asarray(ckv / ckv_scale, FP8), np.float32) * ckv_scale
    kpe_dq = np.asarray(jnp.asarray(kpe / kpe_scale, FP8), np.float32) * kpe_scale
    q = jnp.concatenate([q_nope, q_pe], -1)
    for r in range(batch):
        pages = indices[indptr[r]: indptr[r + 1]]
        c = ckv_dq[pages].reshape(-1, d_ckv)[: kv_lens[r]]
        p = kpe_dq[pages].reshape(-1, d_kpe)[: kv_lens[r]]
        k = jnp.asarray(np.concatenate([c, p], -1))[:, None, :]
        v = jnp.asarray(c)[:, None, :]
        ref, ref_lse = attention_reference(q[r: r + 1], k, v, sm_scale=sm)
        np.testing.assert_allclose(
            np.asarray(out[r]), np.asarray(ref[0]), rtol=0.02, atol=0.02)
        np.testing.assert_allclose(
            np.asarray(lse[r]), np.asarray(ref_lse[0]), rtol=0.02, atol=0.02)


def test_mla_fp8_split_kv_and_float8_input():
    """Split-KV merge path + float8-dtype cache inputs (auto-bitcast)."""
    rng = np.random.default_rng(8)
    page_size, heads, d_ckv, d_kpe = 8, 2, 32, 32
    kv_lens = [70]
    indptr, indices, last = _page_table(rng, kv_lens, page_size, 12)
    ckv = rng.standard_normal((12, page_size, d_ckv)).astype(np.float32)
    kpe = rng.standard_normal((12, page_size, d_kpe)).astype(np.float32)
    scale = 0.09
    FP8 = jnp.float8_e4m3fn
    ckv8 = jnp.asarray(ckv / scale, FP8)
    kpe8 = jnp.asarray(kpe / scale, FP8)
    q_nope = jnp.asarray(rng.standard_normal((1, heads, d_ckv)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((1, heads, d_kpe)), jnp.float32)

    w = BatchMLAPagedAttentionWrapper(backend="pallas", tile_k=16)
    w.plan(np.arange(2), indptr, indices, np.asarray(kv_lens), heads,
           d_ckv, d_kpe, page_size, kv_chunk_size=32)
    out = w.run(q_nope, q_pe, ckv8, kpe8, interpret=True,
                ckv_scale=scale, kpe_scale=scale)

    w_ref = BatchMLAPagedAttentionWrapper(backend="reference")
    w_ref.plan(np.arange(2), indptr, indices, np.asarray(kv_lens), heads,
               d_ckv, d_kpe, page_size)
    ref = w_ref.run(
        q_nope, q_pe,
        jnp.asarray(np.asarray(jnp.asarray(ckv / scale, FP8), np.float32)
                    * scale),
        jnp.asarray(np.asarray(jnp.asarray(kpe / scale, FP8), np.float32)
                    * scale),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.02,
                               atol=0.02)


def test_mla_split_kv():
    """Long kv forces split + merge in the MLA path."""
    rng = np.random.default_rng(2)
    page_size, heads, d_ckv, d_kpe = 8, 2, 32, 32
    kv_lens = [70]
    indptr, indices, last = _page_table(rng, kv_lens, page_size, 12)
    ckv_cache = jnp.asarray(rng.standard_normal((12, page_size, d_ckv)), jnp.float32)
    kpe_cache = jnp.asarray(rng.standard_normal((12, page_size, d_kpe)), jnp.float32)
    q_nope = jnp.asarray(rng.standard_normal((1, heads, d_ckv)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((1, heads, d_kpe)), jnp.float32)

    w = BatchMLAPagedAttentionWrapper(backend="pallas", tile_k=16)
    w.plan(np.arange(2), indptr, indices, np.asarray(kv_lens), heads,
           d_ckv, d_kpe, page_size, kv_chunk_size=32)
    out = w.run(q_nope, q_pe, ckv_cache, kpe_cache, interpret=True)

    w_ref = BatchMLAPagedAttentionWrapper(backend="reference")
    w_ref.plan(np.arange(2), indptr, indices, np.asarray(kv_lens), heads,
               d_ckv, d_kpe, page_size)
    ref = w_ref.run(q_nope, q_pe, ckv_cache, kpe_cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)
