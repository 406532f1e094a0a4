"""Sorting-free sampling ops.

Reference parity: flashinfer/sampling.py:518-1477 — `softmax`,
`sampling_from_probs/logits`, `top_p/top_k/min_p/top_k_top_p` samplers,
`top_p_renorm_probs`, `top_k_renorm_probs`, `top_k_mask_logits`,
`chain_speculative_sampling`. Kernels: include/flashinfer/sampling.cuh
(dual-pivot rejection, OnlineSoftmaxFusedKernel:315, TopK/TopP samplers
:835-1135).

TPU re-design. The reference avoids sorting with a *data-dependent
dual-pivot rejection loop* per row — efficient on GPU where each block owns
a row, but data-dependent loop trip counts defeat XLA. Here every sampler is
sorting-free via a **fixed-trip-count pivot bisection** over the value
domain (probabilities are in [0,1]; ~30 f32 bisection steps reach exact
float resolution), which XLA compiles to a tight vectorized loop over the
whole batch — same algorithmic idea (find the truncation threshold without
sorting), deterministic by construction, CUDA-graph stability replaced by
static shapes under jit.

RNG: functions take a JAX PRNG ``key`` instead of a torch generator. The
reference's ``deterministic`` flag selects a fixed reduction order; JAX/XLA
reductions are deterministic already, so the flag is accepted and ignored.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from flashinfer_tpu.utils import round_up

__all__ = [
    "softmax",
    "sampling_from_probs",
    "sampling_from_logits",
    "top_p_sampling_from_probs",
    "top_k_sampling_from_probs",
    "min_p_sampling_from_probs",
    "top_k_top_p_sampling_from_probs",
    "top_k_top_p_sampling_from_logits",
    "top_p_renorm_probs",
    "top_k_renorm_probs",
    "top_k_mask_logits",
    "chain_speculative_sampling",
]

_BISECT_ITERS = 32


def _as_row_param(x, batch, dtype=jnp.float32):
    """Scalar or [batch] -> [batch, 1] array."""
    arr = jnp.asarray(x, dtype)
    if arr.ndim == 0:
        arr = jnp.broadcast_to(arr, (batch,))
    return arr[:, None]


def softmax(
    logits: jax.Array,
    temperature: float | jax.Array = 1.0,
    *,
    enable_pdl: Optional[bool] = None,
) -> jax.Array:
    """Temperature-fused softmax (reference sampling.py softmax /
    OnlineSoftmaxFusedKernel sampling.cuh:315). temperature may be scalar or
    per-row [batch]. temperature == 0 rows produce a one-hot argmax."""
    batch = logits.shape[0]
    t = _as_row_param(temperature, batch)
    x = logits.astype(jnp.float32)
    safe_t = jnp.where(t > 0, t, 1.0)
    y = jax.nn.softmax(x / safe_t, axis=-1)
    greedy = (x == jnp.max(x, axis=-1, keepdims=True)).astype(jnp.float32)
    greedy = greedy / jnp.sum(greedy, axis=-1, keepdims=True)
    return jnp.where(t > 0, y, greedy)


def _inverse_cdf_sample(probs: jax.Array, u: jax.Array) -> jax.Array:
    """Sample one index per row by inverse CDF: the first index where
    cumsum(probs) exceeds u * total (total guards unnormalized rows)."""
    cdf = jnp.cumsum(probs, axis=-1)
    total = cdf[:, -1:]
    target = u[:, None] * total
    hit = cdf > target
    # first True; all-False (u==1 edge) -> last index with prob > 0
    idx = jnp.argmax(hit, axis=-1)
    any_hit = jnp.any(hit, axis=-1)
    last_nz = probs.shape[-1] - 1 - jnp.argmax(
        (probs[:, ::-1] > 0), axis=-1
    )
    return jnp.where(any_hit, idx, last_nz).astype(jnp.int32)


def sampling_from_probs(
    probs: jax.Array,
    key: jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    backend: str = "auto",
) -> jax.Array:
    """Categorical sampling from (possibly unnormalized) probabilities
    (reference sampling.py sampling_from_probs). ``indices`` enables
    shared-probs batches: row i samples from probs[indices[i]]."""
    if indices is not None:
        probs = probs[indices]
    probs = probs.astype(jnp.float32)
    batch, vocab = probs.shape
    if _use_pallas(backend, vocab):
        # cumsum-free Gumbel-max draw, one HBM pass (scale-invariant, so
        # unnormalized rows need no separate total)
        dummy = jnp.ones((batch, 1))
        return _family_call(probs, key, dummy.astype(jnp.int32), dummy,
                            filt="none", out_mode="sample")
    u = jax.random.uniform(key, (batch,), jnp.float32)
    return _inverse_cdf_sample(probs, u)


def sampling_from_logits(
    logits: jax.Array,
    key: jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    temperature: float | jax.Array = 1.0,
    deterministic: bool = True,
) -> jax.Array:
    """Fused softmax+sample via the Gumbel trick — one pass, no
    normalization (reference SamplingFromLogitsKernel sampling.cuh:747)."""
    if indices is not None:
        logits = logits[indices]
    batch = logits.shape[0]
    t = _as_row_param(temperature, batch)
    x = logits.astype(jnp.float32)
    safe_t = jnp.where(t > 0, t, 1.0)
    g = jax.random.gumbel(key, x.shape, jnp.float32)
    scored = x / safe_t + jnp.where(t > 0, g, 0.0)
    return jnp.argmax(scored, axis=-1).astype(jnp.int32)


def _top_p_threshold(probs: jax.Array, top_p: jax.Array) -> jax.Array:
    """Largest pivot t (per row) with sum(p_i for p_i > t) >= top_p, found by
    fixed-iteration bisection (sorting-free; the reference reaches the same
    set with dual-pivot rejection, sampling.cuh:950)."""
    # rows with top_p >= 1 keep everything (pivot -1)
    lo = jnp.zeros_like(top_p)
    hi = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        mass = jnp.sum(jnp.where(probs > mid, probs, 0.0), axis=-1, keepdims=True)
        ok = mass >= top_p  # pivot can rise
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    return jnp.where(top_p >= 1.0, -1.0, lo)


def _top_k_threshold(probs: jax.Array, top_k: jax.Array) -> jax.Array:
    """Pivot t with count(p_i > t) <= k, maximal coverage — bisection on the
    value domain (reference TopKSamplingFromProbKernel sampling.cuh:835)."""
    vocab = probs.shape[-1]
    lo = jnp.zeros_like(probs[:, :1])
    hi = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        cnt = jnp.sum((probs > mid).astype(jnp.int32), axis=-1, keepdims=True)
        ok = cnt >= top_k  # still enough entries above pivot -> raise lo
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    return jnp.where(top_k >= vocab, -1.0, lo)


def top_p_sampling_from_probs(
    probs: jax.Array,
    key: jax.Array,
    top_p: float | jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    backend: str = "auto",
) -> jax.Array:
    """Nucleus sampling (reference sampling.py:697)."""
    if indices is not None:
        probs = probs[indices]
    probs = probs.astype(jnp.float32)
    batch, vocab = probs.shape
    p = _as_row_param(top_p, batch)
    if _use_pallas(backend, vocab):
        return _family_call(probs, key, jnp.ones((batch, 1), jnp.int32), p,
                            filt="top_p", out_mode="sample")
    t = _top_p_threshold(probs, p)
    masked = jnp.where(probs > t, probs, 0.0)
    u = jax.random.uniform(key, (batch,), jnp.float32)
    return _inverse_cdf_sample(masked, u)


def top_k_sampling_from_probs(
    probs: jax.Array,
    key: jax.Array,
    top_k: int | jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    backend: str = "auto",
) -> jax.Array:
    """Top-k sampling (reference sampling.py top_k_sampling_from_probs)."""
    if indices is not None:
        probs = probs[indices]
    probs = probs.astype(jnp.float32)
    batch, vocab = probs.shape
    k = _as_row_param(top_k, batch, jnp.int32)
    if _use_pallas(backend, vocab):
        return _family_call(probs, key, k, jnp.ones((batch, 1)),
                            filt="top_k", out_mode="sample")
    t = _top_k_threshold(probs, k)
    masked = jnp.where(probs > t, probs, 0.0)
    u = jax.random.uniform(key, (batch,), jnp.float32)
    return _inverse_cdf_sample(masked, u)


def min_p_sampling_from_probs(
    probs: jax.Array,
    key: jax.Array,
    min_p: float | jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    deterministic: bool = True,
    backend: str = "auto",
) -> jax.Array:
    """Min-p sampling: keep tokens with p >= min_p * max_p (reference
    sampling.py min_p_sampling_from_probs / MinPSamplingFromProbKernel
    sampling.cuh:1057)."""
    if indices is not None:
        probs = probs[indices]
    probs = probs.astype(jnp.float32)
    batch, vocab = probs.shape
    mp = _as_row_param(min_p, batch)
    if _use_pallas(backend, vocab):
        return _family_call(probs, key, jnp.ones((batch, 1), jnp.int32), mp,
                            filt="min_p", out_mode="sample")
    t = mp * jnp.max(probs, axis=-1, keepdims=True)
    masked = jnp.where(probs >= t, probs, 0.0)
    u = jax.random.uniform(key, (batch,), jnp.float32)
    return _inverse_cdf_sample(masked, u)


def top_k_top_p_sampling_from_probs(
    probs: jax.Array,
    key: jax.Array,
    top_k: int | jax.Array,
    top_p: float | jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    filter_apply_order: str = "top_k_first",
    deterministic: bool = True,
    backend: str = "auto",
) -> jax.Array:
    """Joint top-k + top-p (reference sampling.py:
    top_k_top_p_sampling_from_probs; fused kernel sampling.cuh:1135).
    backend: "auto" uses the single-pass Pallas kernel on TPU for large
    vocabularies (Gumbel-max draw — same distribution, different stream
    than the XLA inverse-CDF path), "xla" forces the jnp path, "pallas"
    forces the kernel."""
    if indices is not None:
        probs = probs[indices]
    probs = probs.astype(jnp.float32)
    batch = probs.shape[0]
    k = _as_row_param(top_k, batch, jnp.int32)
    p = _as_row_param(top_p, batch)
    if filter_apply_order == "top_k_first":
        if backend == "pallas" or (
            backend == "auto" and probs.shape[-1] >= 4096 and _pallas_ok()
        ):
            # single-pass fused kernel: the whole bisection runs on the
            # VMEM-resident row tile, HBM touched once (~60x less traffic
            # than the XLA path's ~64 full-row passes)
            return _fused_top_k_top_p_sample(probs, key, k, p)
        tk = _top_k_threshold(probs, k)
        probs1 = jnp.where(probs > tk, probs, 0.0)
        probs1 = probs1 / jnp.sum(probs1, axis=-1, keepdims=True)
        tp = _top_p_threshold(probs1, p)
        masked = jnp.where(probs1 > tp, probs1, 0.0)
    elif filter_apply_order == "joint":
        if _use_pallas(backend, probs.shape[-1]):
            return _family_call(probs, key, k, p,
                                filt="top_k_top_p_joint", out_mode="sample")
        tk = _top_k_threshold(probs, k)
        tp = _top_p_threshold(probs, p)
        t = jnp.maximum(tk, tp)
        masked = jnp.where(probs > t, probs, 0.0)
    else:
        raise ValueError(f"unknown filter_apply_order {filter_apply_order!r}")
    u = jax.random.uniform(key, (batch,), jnp.float32)
    return _inverse_cdf_sample(masked, u)


def top_k_top_p_sampling_from_logits(
    logits: jax.Array,
    key: jax.Array,
    top_k: int | jax.Array,
    top_p: float | jax.Array,
    *,
    indices: Optional[jax.Array] = None,
    filter_apply_order: str = "top_k_first",
    deterministic: bool = True,
) -> jax.Array:
    """(reference sampling.py top_k_top_p_sampling_from_logits)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return top_k_top_p_sampling_from_probs(
        probs, key, top_k, top_p,
        indices=indices, filter_apply_order=filter_apply_order,
        deterministic=deterministic,
    )


def top_p_renorm_probs(probs: jax.Array, top_p: float | jax.Array,
                       *, backend: str = "auto") -> jax.Array:
    """Zero out everything outside the top-p set and renormalize
    (reference sampling.py top_p_renorm_probs / renorm.cu)."""
    probs = probs.astype(jnp.float32)
    batch, vocab = probs.shape
    p = _as_row_param(top_p, batch)
    if _use_pallas(backend, vocab):
        return _family_call(probs, None, jnp.ones((batch, 1), jnp.int32), p,
                            filt="top_p", out_mode="renorm")
    t = _top_p_threshold(probs, p)
    masked = jnp.where(probs > t, probs, 0.0)
    return masked / jnp.sum(masked, axis=-1, keepdims=True)


def top_k_renorm_probs(probs: jax.Array, top_k: int | jax.Array,
                       *, backend: str = "auto") -> jax.Array:
    """(reference sampling.py top_k_renorm_probs)."""
    probs = probs.astype(jnp.float32)
    batch, vocab = probs.shape
    k = _as_row_param(top_k, batch, jnp.int32)
    if _use_pallas(backend, vocab):
        return _family_call(probs, None, k, jnp.ones((batch, 1)),
                            filt="top_k", out_mode="renorm")
    t = _top_k_threshold(probs, k)
    masked = jnp.where(probs > t, probs, 0.0)
    return masked / jnp.sum(masked, axis=-1, keepdims=True)


def top_k_mask_logits(logits: jax.Array, top_k: int | jax.Array,
                      *, backend: str = "auto") -> jax.Array:
    """Mask logits outside the top-k set to -inf (reference sampling.py
    top_k_mask_logits). Bisection runs on logits directly (monotone)."""
    x = logits.astype(jnp.float32)
    batch, vocab = x.shape
    k = _as_row_param(top_k, batch, jnp.int32)
    if _use_pallas(backend, vocab):
        return _family_call(x, None, k, jnp.ones((batch, 1)),
                            filt="top_k", out_mode="mask_logits")
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        cnt = jnp.sum((x > mid).astype(jnp.int32), axis=-1, keepdims=True)
        ok = cnt >= k
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    t = jnp.where(k >= vocab, lo - 1.0, lo)
    return jnp.where(x > t, logits, -jnp.inf)


def chain_speculative_sampling(
    draft_probs: jax.Array,
    draft_token_ids: jax.Array,
    target_probs: jax.Array,
    key: jax.Array,
    *,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Chained speculative-decoding verification (reference sampling.py
    chain_speculative_sampling; kernel sampling.cuh ChainSpeculative...).

    Args:
      draft_probs: [batch, num_spec, vocab] draft-model distributions.
      draft_token_ids: [batch, num_spec] proposed tokens.
      target_probs: [batch, num_spec + 1, vocab] target-model distributions
        (the +1 row samples the bonus token after full acceptance).

    Returns:
      output_token_ids: [batch, num_spec + 1], -1 after the first rejection.
      output_accepted_token_num: [batch] accepted draft-token count.
      output_emitted_draft_token_num: [batch] emitted draft tokens (==
      accepted count; name kept for reference parity).
    """
    batch, num_spec, vocab = draft_probs.shape
    draft_probs = draft_probs.astype(jnp.float32)
    target_probs = target_probs.astype(jnp.float32)

    keys = jax.random.split(key, num_spec + 1)
    u = jax.random.uniform(keys[0], (batch, num_spec), jnp.float32)

    tok = draft_token_ids  # [batch, num_spec]
    bidx = jnp.arange(batch)[:, None]
    sidx = jnp.arange(num_spec)[None, :]
    p_target = target_probs[bidx, sidx, tok]
    p_draft = draft_probs[bidx, sidx, tok]
    accept = u < jnp.minimum(1.0, p_target / jnp.maximum(p_draft, 1e-20))

    # position of first rejection (num_spec if none)
    rejected = ~accept
    first_rej = jnp.where(
        jnp.any(rejected, axis=1), jnp.argmax(rejected, axis=1), num_spec
    )  # [batch]

    # residual distribution at the rejection position
    pos = jnp.minimum(first_rej, num_spec - 1)
    resid = jnp.maximum(
        target_probs[jnp.arange(batch), pos] - draft_probs[jnp.arange(batch), pos],
        0.0,
    )
    resid_sum = jnp.sum(resid, axis=-1, keepdims=True)
    # fall back to the target distribution when residual is empty
    resid = jnp.where(resid_sum > 0, resid, target_probs[jnp.arange(batch), pos])
    u_res = jax.random.uniform(keys[1], (batch,), jnp.float32)
    resample_tok = _inverse_cdf_sample(resid, u_res)

    # bonus token from the last target row (emitted only on full acceptance)
    u_bonus = jax.random.uniform(keys[2], (batch,), jnp.float32)
    bonus_tok = _inverse_cdf_sample(target_probs[:, num_spec], u_bonus)

    steps = jnp.arange(num_spec + 1)[None, :]  # output positions
    fr = first_rej[:, None]
    out = jnp.where(
        steps < fr,
        jnp.pad(tok, ((0, 0), (0, 1))),  # accepted draft tokens
        jnp.where(
            steps == fr,
            jnp.where(fr < num_spec, resample_tok[:, None], bonus_tok[:, None]),
            -1,
        ),
    ).astype(jnp.int32)
    accepted = first_rej.astype(jnp.int32)
    return out, accepted, accepted


def _pallas_ok() -> bool:
    from flashinfer_tpu.utils import default_interpret, on_tpu

    return on_tpu() and not default_interpret()


# ---------------------------------------------------------------------------
# fused single-pass sampler family (Pallas)
# ---------------------------------------------------------------------------
#
# One parameterized kernel covers the whole sampling suite (reference
# sampling.cuh:835-1135 + renorm.cu ships one fused kernel per op): the row
# tile is VMEM-resident, so the 32-iteration threshold bisections and the
# categorical draw all run on on-chip data and HBM is touched exactly once
# per element. The XLA paths above re-read [batch, vocab] from HBM per
# bisection iteration (~32-64 full passes).
#
# Static parameters:
#   filt     — which truncation set to compute:
#              "none" | "top_k" | "top_p" | "min_p" | "top_k_top_p_seq"
#              (top-k, renorm, then top-p: filter_apply_order="top_k_first")
#              | "top_k_top_p_joint" (max of both pivots on raw probs)
#   out_mode — "sample" (Gumbel-max token, [batch] i32)
#              | "renorm" (masked probs renormalized, [batch, vocab] f32)
#              | "mask_logits" (input kept/-inf in the LOGIT domain)


def _family_kernel(seed_ref, x_ref, k_ref, p_ref, out_ref, *scratch_refs,
                   vocab: int, rows: int, filt: str, out_mode: str):
    x = x_ref[:].astype(jnp.float32)  # [rows, Vpad]
    vpad = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, vpad), 1)
    real = lane < vocab
    k = k_ref[:]  # [rows, 1] int32
    p = p_ref[:]  # [rows, 1] f32

    def bisect(pr, ok_fn, lo, hi):
        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi) * 0.5
            ok = ok_fn(pr, mid)
            lo = jnp.where(ok, mid, lo)
            hi = jnp.where(ok, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
        return lo

    def topk_pivot(pr):
        t = bisect(
            pr,
            lambda pr, mid: jnp.sum(
                (pr > mid).astype(jnp.int32), axis=-1, keepdims=True) >= k,
            jnp.zeros((rows, 1), jnp.float32),
            jnp.max(pr, axis=-1, keepdims=True),
        )
        return jnp.where(k >= vocab, -1.0, t)

    def topp_pivot(pr):
        t = bisect(
            pr,
            lambda pr, mid: jnp.sum(
                jnp.where(pr > mid, pr, 0.0), axis=-1, keepdims=True) >= p,
            jnp.zeros((rows, 1), jnp.float32),
            jnp.max(pr, axis=-1, keepdims=True),
        )
        return jnp.where(p >= 1.0, -1.0, t)

    if out_mode == "mask_logits":
        # top-k in the logit domain (mirrors top_k_mask_logits): bisect
        # between the row min and max; padded lanes sit at -inf
        xm = jnp.where(real, x, -jnp.inf)
        lo0 = jnp.min(jnp.where(real, x, jnp.inf), axis=-1, keepdims=True)
        hi0 = jnp.max(xm, axis=-1, keepdims=True)
        t = bisect(
            xm,
            lambda pr, mid: jnp.sum(
                (pr > mid).astype(jnp.int32), axis=-1, keepdims=True) >= k,
            lo0, hi0,
        )
        t = jnp.where(k >= vocab, t - 1.0, t)
        out_ref[:] = jnp.where(xm > t, x, -jnp.inf)
        return

    probs = jnp.where(real, x, 0.0)
    if filt == "none":
        masked = probs
    elif filt == "top_k":
        masked = jnp.where(probs > topk_pivot(probs), probs, 0.0)
    elif filt == "top_p":
        masked = jnp.where(probs > topp_pivot(probs), probs, 0.0)
    elif filt == "min_p":
        t = p * jnp.max(probs, axis=-1, keepdims=True)
        masked = jnp.where(probs >= t, probs, 0.0)
    elif filt == "top_k_top_p_joint":
        t = jnp.maximum(topk_pivot(probs), topp_pivot(probs))
        masked = jnp.where(probs > t, probs, 0.0)
    elif filt == "top_k_top_p_seq":
        p1 = jnp.where(probs > topk_pivot(probs), probs, 0.0)
        p1 = p1 / jnp.sum(p1, axis=-1, keepdims=True)
        # round-trip through VMEM scratch so the pre-renorm temporaries
        # retire before the second bisection (bounds Mosaic's liveness)
        scratch_refs[0][:] = p1
        p1 = scratch_refs[0][:]
        masked = jnp.where(p1 > topp_pivot(p1), p1, 0.0)
    else:
        raise ValueError(filt)

    if out_mode == "renorm":
        out_ref[:] = masked / jnp.sum(masked, axis=-1, keepdims=True)
        return

    # out_mode == "sample": Gumbel-max categorical draw over the masked set
    # (argmax replaces the XLA path's inverse-CDF cumsum — no prefix scan
    # on 128k lanes). Scale-invariant, so unnormalized rows are fine.
    # Randomness is a counter-based hash of (seed, global row, lane) — a
    # murmur3 finalizer in int32 ops — rather than pltpu.prng_random_bits,
    # which returns zeros under the TPU interpreter and would make interpret
    # runs (CI) silently degenerate to argmax.
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, vpad), 0)
    x32 = (seed_ref[0]
           + (pl.program_id(0) * rows + row) * jnp.int32(-1640531527)
           + lane * jnp.int32(40503))

    def mix(h):
        h = jnp.bitwise_xor(h, jax.lax.shift_right_logical(h, 16))
        h = h * jnp.int32(-2048144789)   # 0x85ebca6b
        h = jnp.bitwise_xor(h, jax.lax.shift_right_logical(h, 13))
        h = h * jnp.int32(-1028477387)   # 0xc2b2ae35
        h = jnp.bitwise_xor(h, jax.lax.shift_right_logical(h, 16))
        return h

    u24 = jax.lax.shift_right_logical(mix(mix(x32)), 8)  # 24 positive bits
    u = u24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7
    g = -jnp.log(-jnp.log(u))
    keep = jnp.logical_and(masked > 0.0, real)
    scored = jnp.where(keep, jnp.log(masked) + g, -jnp.inf)
    out_ref[:] = jnp.argmax(scored, axis=-1, keepdims=True).astype(jnp.int32)


def _family_call(x, key, k, p, *, filt: str, out_mode: str,
                 interpret: bool = False):
    """Invoke the fused sampler family. x [batch, vocab] (probs, or logits
    for out_mode="mask_logits"); k [batch,1] i32; p [batch,1] f32; key is a
    PRNG key (sample mode) or None."""
    batch, vocab = x.shape
    rows = 8
    vpad = round_up(vocab, 128)
    bpad = round_up(batch, rows)
    x = jnp.pad(x, ((0, bpad - batch), (0, vpad - vocab)))
    k = jnp.pad(k, ((0, bpad - batch), (0, 0)), constant_values=1)
    p = jnp.pad(p, ((0, bpad - batch), (0, 0)), constant_values=1.0)
    if key is not None:
        seed = jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    from jax.experimental.pallas import tpu as pltpu

    if out_mode == "sample":
        out_shape = jax.ShapeDtypeStruct((bpad, 1), jnp.int32)
        out_spec = pl.BlockSpec((rows, 1), lambda i, *s: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((bpad, vpad), jnp.float32)
        out_spec = pl.BlockSpec((rows, vpad), lambda i, *s: (i, 0),
                                memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((rows, vpad), jnp.float32)]
        if filt == "top_k_top_p_seq" else []
    )

    out = pl.pallas_call(
        functools.partial(_family_kernel, vocab=vocab, rows=rows,
                          filt=filt, out_mode=out_mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bpad // rows,),
            in_specs=[
                pl.BlockSpec((rows, vpad), lambda i, *s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 1), lambda i, *s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 1), lambda i, *s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        # TPU-semantic interpret mode: the plain HLO interpreter has no
        # prng_seed/prng_random_bits rules
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the [rows, vocab] f32 tile + its elementwise temporaries
            # exceed Mosaic's default 16M scoped-vmem budget at 128k
            # vocabularies once grid>1 double-buffers the input; the
            # physical VMEM is far larger — raise the cap instead of
            # shrinking rows (which would halve HBM streaming efficiency)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=bpad * vpad * 70,
            bytes_accessed=bpad * vpad * x.dtype.itemsize,
            transcendentals=bpad * vpad * 3,
        ),
    )(seed, x, k, p)
    if out_mode == "sample":
        return out[:batch, 0]
    return out[:batch, :vocab]


def _fused_top_k_top_p_sample(probs, key, k, p, interpret=False):
    """Pallas path of top_k_top_p_sampling_from_probs (top_k_first order).
    probs f32/bf16 [batch, vocab]; k [batch,1] i32; p [batch,1] f32."""
    return _family_call(probs, key, k, p, filt="top_k_top_p_seq",
                        out_mode="sample", interpret=interpret)


def _use_pallas(backend: str, vocab: int) -> bool:
    return backend == "pallas" or (
        backend == "auto" and vocab >= 4096 and _pallas_ok()
    )
