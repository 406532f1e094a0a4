"""Feature-grid fuzzing: the Pallas batch kernel vs the oracle across the
full (page_size x layout x dtype x window x softcap x mask x causal x qo
mix x gqa group) space.

The reference grids these dimensions with pytest parametrizations
(tests/attention/test_batch_prefill_kernels.py); enumerating the full cross
product in interpret mode would take hours on CPU, so this file pins the
historically risky combinations explicitly and property-fuzzes the rest
with seeded random draws from the whole space (new seeds = new coverage,
failures reproduce by seed).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.batch import (
    BatchDecodeWithPagedKVCacheWrapper,
    BatchPrefillWithPagedKVCacheWrapper,
)

FP8 = jnp.float8_e4m3fn


def _page_table(rng, kv_lens, page_size, extra_pages=2):
    pages_needed = [-(-s // page_size) for s in kv_lens]
    total = sum(pages_needed) + extra_pages
    indptr = np.concatenate([[0], np.cumsum(pages_needed)]).astype(np.int32)
    indices = rng.permutation(total)[: indptr[-1]].astype(np.int32)
    last = np.asarray(
        [s - (p - 1) * page_size if p else 0
         for s, p in zip(kv_lens, pages_needed)], np.int32)
    return indptr, indices, last, total


def _run_config(seed, *, batch, max_kv, page_size, layout, fp8, causal,
                max_qo, window, soft_cap, custom_mask, group, kvh=2, d=32):
    rng = np.random.default_rng(seed)
    kv_lens = rng.integers(1, max_kv + 1, batch).tolist()
    qo_lens = rng.integers(1, max_qo + 1, batch).tolist()
    if causal or max_qo > 1:
        # queries are the LAST qo tokens of each sequence
        kv_lens = [max(k, q) for k, q in zip(kv_lens, qo_lens)]
    hq = kvh * group
    indptr, indices, last, total = _page_table(rng, kv_lens, page_size)

    shape = ((total, kvh, page_size, d) if layout == "HND"
             else (total, page_size, kvh, d))
    k = rng.standard_normal(shape).astype(np.float32)
    v = rng.standard_normal(shape).astype(np.float32)
    ks = vs = 1.0
    if fp8:
        ks, vs = 0.11, 0.06
        cache = (jnp.asarray(k / ks, FP8), jnp.asarray(v / vs, FP8))
    else:
        cache = (jnp.asarray(k), jnp.asarray(v))

    nnz = sum(qo_lens)
    q = jnp.asarray(rng.standard_normal((nnz, hq, d)), jnp.float32)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)

    kw = dict(causal=causal, window_left=window, logits_soft_cap=soft_cap)
    if custom_mask:
        # random keep-mask per (qo, kv) pair; composes with window/causal
        kw["custom_mask"] = np.concatenate([
            rng.random(qo * kv) > 0.25
            for qo, kv in zip(qo_lens, kv_lens)
        ])
        kw["kv_len_arr"] = np.asarray(kv_lens)

    decode_like = max_qo == 1
    if decode_like:
        cls, plan_args = BatchDecodeWithPagedKVCacheWrapper, (
            indptr, indices, last, hq, kvh, d, page_size)
        del kw["causal"]  # decode wrapper is implicitly causal-at-the-end
    else:
        cls, plan_args = BatchPrefillWithPagedKVCacheWrapper, (
            qo_indptr, indptr, indices, last, hq, kvh, d, page_size)

    outs = {}
    for backend in ("reference", "pallas"):
        w = cls(backend=backend, kv_layout=layout)
        w.plan(*plan_args, **kw)
        outs[backend] = w.run(
            q, cache, k_scale=ks, v_scale=vs,
            interpret=True if backend == "pallas" else None)
    tol = 0.05 if fp8 else 2e-3
    np.testing.assert_allclose(
        np.asarray(outs["pallas"], np.float32),
        np.asarray(outs["reference"], np.float32), rtol=tol, atol=tol,
        err_msg=f"seed={seed} cfg={dict(batch=batch, page_size=page_size, layout=layout, fp8=fp8, causal=causal, max_qo=max_qo, window=window, soft_cap=soft_cap, custom_mask=custom_mask, group=group)}",
    )


# -------------------------------------------------------- pinned risky combos

RISKY = [
    # fp8 + sliding window + NHD (permuted decode columns meet the window
    # mask in permuted coordinates)
    dict(batch=2, max_kv=16, page_size=4, layout="NHD", fp8=True,
         causal=False, max_qo=1, window=6, soft_cap=0.0, custom_mask=False,
         group=2),
    # fp8 + custom mask (mask columns must follow the even/odd permutation)
    dict(batch=2, max_kv=12, page_size=4, layout="HND", fp8=True,
         causal=False, max_qo=1, window=-1, soft_cap=0.0, custom_mask=True,
         group=1),
    # page_size=1 (vector-sparse regime) + GQA packing + causal prefill
    dict(batch=2, max_kv=8, page_size=1, layout="HND", fp8=False,
         causal=True, max_qo=5, window=-1, soft_cap=0.0, custom_mask=False,
         group=4),
    # custom mask + causal prefill + soft cap together
    dict(batch=2, max_kv=12, page_size=4, layout="HND", fp8=False,
         causal=True, max_qo=5, window=-1, soft_cap=15.0, custom_mask=True,
         group=2),
    # window + causal + GQA-packed prefill, NHD
    dict(batch=2, max_kv=16, page_size=8, layout="NHD", fp8=False,
         causal=True, max_qo=6, window=5, soft_cap=0.0, custom_mask=False,
         group=2),
    # fp8 prefill with causal + window (both masks in permuted space)
    dict(batch=2, max_kv=16, page_size=8, layout="HND", fp8=True,
         causal=True, max_qo=4, window=5, soft_cap=0.0, custom_mask=False,
         group=2),
]


@pytest.mark.parametrize("cfg", RISKY, ids=lambda c: (
    f"ps{c['page_size']}-{c['layout']}-{'fp8' if c['fp8'] else 'f32'}"
    f"-qo{c['max_qo']}-w{c['window']}-g{c['group']}"
    f"{'-mask' if c['custom_mask'] else ''}"
    f"{'-causal' if c['causal'] else ''}"
    f"{'-cap' if c['soft_cap'] else ''}"))
def test_pinned_risky_combo(cfg):
    _run_config(1234, **cfg)


# ------------------------------------------------------------- property fuzz

@pytest.mark.parametrize("seed", range(8))
def test_feature_space_fuzz(seed):
    rng = np.random.default_rng(9000 + seed)
    cfg = dict(
        batch=int(rng.integers(1, 4)),
        max_kv=int(rng.integers(4, 20)),
        page_size=int(rng.choice([1, 4, 4, 8])),
        layout=str(rng.choice(["HND", "NHD"])),
        fp8=bool(rng.random() < 0.4),
        causal=bool(rng.random() < 0.5),
        max_qo=int(rng.choice([1, 1, 4, 6])),
        window=int(rng.choice([-1, -1, 5, 9])),
        soft_cap=float(rng.choice([0.0, 0.0, 20.0])),
        custom_mask=bool(rng.random() < 0.3),
        group=int(rng.choice([1, 2, 4])),
    )
    if cfg["max_qo"] == 1:
        cfg["causal"] = False  # decode wrapper is implicitly causal
    _run_config(9000 + seed, **cfg)
