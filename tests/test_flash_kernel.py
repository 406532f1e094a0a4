"""Dense flash-attention Pallas kernel vs pure-JAX oracle.

Mirrors the reference's kernel-vs-python-oracle pattern
(tests/attention/test_single_prefill_kernels.py style). Runs the kernel in
interpret mode on CPU (BASELINE config 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.kernels.flash import flash_attention_dense
from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.attention.variants import FlashSigmoid, make_default_variant


def _qkv(rng, qo, kv, hq, hkv, d, dv=None, dtype=np.float32):
    dv = dv or d
    q = jnp.asarray(rng.standard_normal((qo, hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((kv, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((kv, hkv, dv)), dtype)
    return q, k, v


def _check(kernel_out, ref_out, kernel_lse=None, ref_lse=None, tol=2e-3):
    np.testing.assert_allclose(
        np.asarray(kernel_out, np.float32),
        np.asarray(ref_out, np.float32),
        rtol=tol,
        atol=tol,
    )
    if kernel_lse is not None:
        np.testing.assert_allclose(
            np.asarray(kernel_lse), np.asarray(ref_lse), rtol=tol, atol=tol
        )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("qo,kv", [(64, 64), (17, 80)])
def test_flash_matches_oracle(causal, qo, kv):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, qo, kv, 4, 2, 64)
    out, lse = flash_attention_dense(
        q, k, v, causal=causal, tile_q=32, tile_k=32, interpret=True
    )
    ref, ref_lse = attention_reference(q, k, v, causal=causal)
    _check(out, ref, lse, ref_lse)


def test_flash_sliding_window():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, 48, 48, 2, 2, 32)
    out, lse = flash_attention_dense(
        q, k, v, causal=True, window_left=10, tile_q=16, tile_k=16, interpret=True
    )
    ref, ref_lse = attention_reference(q, k, v, causal=True, window_left=10)
    _check(out, ref, lse, ref_lse)


def test_flash_soft_cap():
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, 32, 32, 2, 2, 32)
    var = make_default_variant(logits_soft_cap=8.0)
    out, lse = flash_attention_dense(
        q, k, v, variant=var, tile_q=16, tile_k=16, interpret=True
    )
    ref, ref_lse = attention_reference(q, k, v, variant=var)
    _check(out, ref, lse, ref_lse)


def test_flash_alibi_variant_params():
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, 32, 32, 4, 4, 32)
    var = make_default_variant(use_alibi=True)
    slopes = jnp.asarray([0.1, 0.2, 0.4, 0.8], jnp.float32)
    params = {"alibi_slopes": slopes}
    out, lse = flash_attention_dense(
        q, k, v, causal=True, variant=var, variant_params=params,
        tile_q=16, tile_k=16, interpret=True,
    )
    ref, ref_lse = attention_reference(
        q, k, v, causal=True, variant=var, variant_params=params
    )
    _check(out, ref, lse, ref_lse)


def test_flash_custom_mask():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, 24, 40, 2, 1, 32)
    mask = jnp.asarray(rng.integers(0, 2, (24, 40)).astype(bool))
    # keep at least one visible kv per row to avoid the all-masked edge
    mask = mask.at[:, 0].set(True)
    out, lse = flash_attention_dense(
        q, k, v, custom_mask=mask, tile_q=8, tile_k=16, interpret=True
    )
    ref, ref_lse = attention_reference(q, k, v, custom_mask=mask)
    _check(out, ref, lse, ref_lse)


def test_flash_sink():
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, 16, 32, 2, 2, 32)
    sink = jnp.asarray([1.5, -0.5], jnp.float32)
    out, lse = flash_attention_dense(
        q, k, v, sink=sink, tile_q=16, tile_k=16, interpret=True
    )
    ref, ref_lse = attention_reference(q, k, v, sink=sink)
    _check(out, ref, lse, ref_lse)


def test_flash_sigmoid_variant():
    rng = np.random.default_rng(6)
    q, k, v = _qkv(rng, 16, 32, 2, 2, 32)
    var = FlashSigmoid(scale=0.7)
    out, _ = flash_attention_dense(
        q, k, v, variant=var, tile_q=16, tile_k=16, interpret=True
    )
    ref, _ = attention_reference(q, k, v, variant=var)
    _check(out, ref)


def test_flash_bf16():
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, 32, 64, 2, 2, 64, dtype=jnp.bfloat16)
    out, lse = flash_attention_dense(
        q, k, v, causal=True, tile_q=16, tile_k=32, interpret=True
    )
    ref, ref_lse = attention_reference(q, k, v, causal=True)
    _check(out, ref, lse, ref_lse, tol=2e-2)


def test_flash_gqa_and_unequal_dv():
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, 16, 48, 8, 2, 64, dv=32)
    out, lse = flash_attention_dense(q, k, v, tile_q=8, tile_k=16, interpret=True)
    ref, ref_lse = attention_reference(q, k, v)
    _check(out, ref, lse, ref_lse)


def test_single_prefill_fused_rope():
    """pos_encoding_mode=ROPE_LLAMA equals rope-then-attend composed by
    hand (reference prefill.py pos_encoding_mode / pos_enc.cuh)."""
    import numpy as np
    from flashinfer_tpu.ops.attention.single import single_prefill_with_kv_cache
    from flashinfer_tpu.ops.attention.reference import attention_reference
    from flashinfer_tpu.ops.rope import apply_rope_pos_ids

    rng = np.random.default_rng(0)
    qo, kv, h, d = 8, 24, 4, 64
    q = jnp.asarray(rng.standard_normal((qo, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, h, d)), jnp.float32)

    out = single_prefill_with_kv_cache(
        q, k, v, causal=True, pos_encoding_mode="ROPE_LLAMA",
        backend="reference")

    q_pos = jnp.arange(kv - qo, kv, dtype=jnp.int32)
    k_pos = jnp.arange(kv, dtype=jnp.int32)
    qr, _ = apply_rope_pos_ids(q, q[:, :1], q_pos)
    kr, _ = apply_rope_pos_ids(k, k[:, :1], k_pos)
    ref, _ = attention_reference(qr, kr, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
