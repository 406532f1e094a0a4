"""Llama-family flagship model, built on flashinfer_tpu ops.

The reference is a kernel library consumed by engines (vLLM/SGLang); this
module is the equivalent of those engines' model definition, included so the
framework is usable end-to-end: paged-KV serving decode (llama_decode_step)
and a dense forward/training path (llama_forward_dense) that the multi-chip
dry-run shards over a mesh.

Weights are a flat dict pytree; shapes follow Llama-3 conventions
(GQA, SwiGLU, RMSNorm, RoPE theta 5e5).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.activation import silu_and_mul
from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.ops.rope import apply_rope_pos_ids

__all__ = [
    "LlamaConfig",
    "llama_init_weights",
    "llama_init_weights_fp8",
    "llama_init_weights_int8",
    "quantize_llama_weights_int8",
    "llama_dense_layer",
    "llama_forward_dense",
    "llama_decode_step",
]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_qo_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 5e5
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        # true Llama-3 shapes incl. the 128k vocabulary (8.03B params)
        return LlamaConfig(vocab_size=128256)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=256,
            hidden_size=128,
            intermediate_size=256,
            num_layers=2,
            num_qo_heads=4,
            num_kv_heads=2,
            head_dim=32,
            dtype=dtype,
        )


def llama_init_weights(key: jax.Array, cfg: LlamaConfig) -> Dict[str, jax.Array]:
    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hq, hkv, L = cfg.num_qo_heads, cfg.num_kv_heads, cfg.num_layers
    keys = jax.random.split(key, 8)
    scale = 1.0 / math.sqrt(h)

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    return {
        "embedding": rnd(keys[0], (cfg.vocab_size, h)),
        "wq": rnd(keys[1], (L, h, hq * d)),
        "wk": rnd(keys[2], (L, h, hkv * d)),
        "wv": rnd(keys[3], (L, h, hkv * d)),
        "wo": rnd(keys[4], (L, hq * d, h)),
        "w_gate_up": rnd(keys[5], (L, h, 2 * i)),
        "w_down": rnd(keys[6], (L, i, h)),
        "attn_norm": jnp.ones((L, h), cfg.dtype),
        "mlp_norm": jnp.ones((L, h), cfg.dtype),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": rnd(keys[7], (h, cfg.vocab_size)),
    }


def _dense_attention_batch(q, k, v, pos):
    """Causal attention over [batch, seq, heads, d] via the oracle (vmapped).
    Used by the dense/training path where XLA SPMD handles sharding."""
    def one(q1, k1, v1):
        out, _ = attention_reference(q1, k1, v1, causal=True)
        return out

    return jax.vmap(one)(q, k, v)


def _assert_dense_params(params: Dict[str, jax.Array]) -> None:
    """The dense paths do raw ``x @ w`` matmuls; quantized containers
    (e4m3 bits or linear int8 + ``_scale``/``_iscale`` keys) would compute
    garbage silently. The quantized containers are engine-only (``_wmm``)."""
    bad = [k for k in params if k.endswith("_scale") or k.endswith("_iscale")]
    if bad:
        raise ValueError(
            f"dense llama paths take unquantized weights; got quantized "
            f"containers (scale keys {bad[:3]}...) — use the serving engine")
    wo = params.get("wo")
    if wo is not None and wo.dtype == jnp.int8:
        raise ValueError(
            "dense llama paths take unquantized weights; got int8 weight "
            "containers — use the serving engine (_wmm dequant path)")


def llama_dense_layer(
    lp: Dict[str, jax.Array],  # ONE layer's weights (no leading L axis)
    x: jax.Array,  # [batch, seq, hidden]
    pos: jax.Array,  # [seq]
    cfg: LlamaConfig,
) -> jax.Array:
    """One dense transformer layer (attn + SwiGLU MLP, causal). Shared by
    the dense forward and the pp-pipelined forward (parallel/pipeline.py)."""
    _assert_dense_params(lp)
    B, S, _ = x.shape
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    xn = rmsnorm(x, lp["attn_norm"], cfg.rms_eps)
    if "wqkv" in lp:  # serving engines fuse the three projections
        qkv = xn @ lp["wqkv"]
        q = qkv[..., : hq * d].reshape(B, S, hq, d)
        k = qkv[..., hq * d : (hq + hkv) * d].reshape(B, S, hkv, d)
        v = qkv[..., (hq + hkv) * d :].reshape(B, S, hkv, d)
    else:
        q = (xn @ lp["wq"]).reshape(B, S, hq, d)
        k = (xn @ lp["wk"]).reshape(B, S, hkv, d)
        v = (xn @ lp["wv"]).reshape(B, S, hkv, d)

    def rope_one(q1, k1):
        return apply_rope_pos_ids(q1, k1, pos, rope_theta=cfg.rope_theta)

    q, k = jax.vmap(rope_one)(q, k)
    attn = _dense_attention_batch(q, k, v, pos)  # [B, S, hq, d]
    x = x + (attn.reshape(B, S, hq * d) @ lp["wo"]).astype(x.dtype)

    xn = rmsnorm(x, lp["mlp_norm"], cfg.rms_eps)
    gate_up = xn @ lp["w_gate_up"]
    x = x + (silu_and_mul(gate_up) @ lp["w_down"]).astype(x.dtype)
    return x


_LLAMA_PER_LAYER = ("wqkv", "wq", "wk", "wv", "wo", "w_gate_up", "w_down",
                    "attn_norm", "mlp_norm")


def llama_forward_dense(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [batch, seq]
    cfg: LlamaConfig,
) -> jax.Array:
    """Dense causal forward returning logits [batch, seq, vocab]."""
    _assert_dense_params(params)
    x = params["embedding"][token_ids]  # [B, S, h]
    S = token_ids.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)
    for layer in range(cfg.num_layers):
        lp = {k: params[k][layer] for k in _LLAMA_PER_LAYER if k in params}
        x = llama_dense_layer(lp, x, pos, cfg)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def llama_decode_step(
    params: Dict[str, jax.Array],
    cfg: LlamaConfig,
    token_ids: jax.Array,  # [batch] current tokens
    positions: jax.Array,  # [batch] their positions
    kv_caches: Tuple[jax.Array, jax.Array],  # [L, pages, kvh, page_size, d] x2
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array,
    attention_fn,
    append_fn,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One serving decode step over a paged cache.

    ``attention_fn(layer_idx, q, k_cache, v_cache) -> out`` and
    ``append_fn(layer_idx, k, v, k_cache, v_cache) -> (k_cache, v_cache)``
    are injected by the serving engine (bench.py / tests) so this function
    stays jittable: planning happened outside, the fns close over plan
    state. Returns (logits [batch, vocab], updated caches).
    """
    _assert_dense_params(params)
    B = token_ids.shape[0]
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_qo_heads, cfg.num_kv_heads
    x = params["embedding"][token_ids]  # [B, h]
    k_all, v_all = kv_caches
    new_k, new_v = [], []

    for layer in range(cfg.num_layers):
        xn = rmsnorm(x, params["attn_norm"][layer], cfg.rms_eps)
        q = (xn @ params["wq"][layer]).reshape(B, hq, d)
        k = (xn @ params["wk"][layer]).reshape(B, hkv, d)
        v = (xn @ params["wv"][layer]).reshape(B, hkv, d)
        q, k = apply_rope_pos_ids(q, k, positions, rope_theta=cfg.rope_theta)
        kc, vc = append_fn(layer, k, v, k_all[layer], v_all[layer])
        new_k.append(kc)
        new_v.append(vc)
        attn = attention_fn(layer, q, kc, vc)  # [B, hq, d]
        x = x + (attn.reshape(B, hq * d) @ params["wo"][layer]).astype(x.dtype)

        xn = rmsnorm(x, params["mlp_norm"][layer], cfg.rms_eps)
        gate_up = xn @ params["w_gate_up"][layer]
        x = x + (silu_and_mul(gate_up) @ params["w_down"][layer]).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, (jnp.stack(new_k), jnp.stack(new_v))


_FP8_WEIGHT_NAMES = ("wq", "wk", "wv", "wo", "w_gate_up", "w_down", "lm_head")


def llama_init_weights_fp8(key: jax.Array, cfg: LlamaConfig) -> Dict[str, jax.Array]:
    """Generate fp8(e4m3)-quantized weights DIRECTLY on the default device.

    The 8B-on-one-chip path: 16 GB of bf16 weights never exist (they would
    not fit a 16 GB chip), and nothing rides the host link (the dev tunnel
    uploads at ~1-10 MB/s — docs/PERF.md). Each stacked weight is generated
    and quantized one layer at a time under ``lax.scan``, so peak HBM is the
    final int8 bits + one layer's f32 temporaries. Same quantization scheme
    as ``quantize_llama_weights_fp8`` (per-output-channel amax/448)."""
    import functools

    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hq, hkv, L = cfg.num_qo_heads, cfg.num_kv_heads, cfg.num_layers
    keys = jax.random.split(key, 8)
    scale0 = 1.0 / math.sqrt(h)

    def quant(w):  # w: f32 [in, out] -> (e4m3 bits int8, f32 scale [1, out])
        amax = jnp.abs(w).max(axis=-2, keepdims=True)
        s = jnp.maximum(amax, 1e-30) / 448.0
        bits = jax.lax.bitcast_convert_type(
            (w / s).astype(jnp.float8_e4m3fn), jnp.int8)
        return bits, s

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen_stacked(k, in_dim, out_dim):
        def body(c, kl):
            w = jax.random.normal(kl, (in_dim, out_dim), jnp.float32) * scale0
            return c, quant(w)

        _, (bits, scales) = jax.lax.scan(body, 0, jax.random.split(k, L))
        return bits, scales

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen_plain(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale0).astype(
            cfg.dtype)

    params: Dict[str, jax.Array] = {}
    for name, kk, in_dim, out_dim in (
        ("wq", keys[1], h, hq * d),
        ("wk", keys[2], h, hkv * d),
        ("wv", keys[3], h, hkv * d),
        ("wo", keys[4], hq * d, h),
        ("w_gate_up", keys[5], h, 2 * i),
        ("w_down", keys[6], i, h),
    ):
        bits, s = gen_stacked(kk, in_dim, out_dim)
        params[name], params[name + "_scale"] = bits, s
    params["embedding"] = gen_plain(keys[0], (cfg.vocab_size, h))
    lm_bits, lm_s = jax.jit(quant)(
        jax.random.normal(keys[7], (h, cfg.vocab_size), jnp.float32) * scale0)
    params["lm_head"], params["lm_head_scale"] = lm_bits, lm_s
    params["attn_norm"] = jnp.ones((L, h), cfg.dtype)
    params["mlp_norm"] = jnp.ones((L, h), cfg.dtype)
    params["final_norm"] = jnp.ones((h,), cfg.dtype)
    return params


def quantize_llama_weights_fp8(params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Quantize the matmul weights to e4m3 (int8 container) with one f32
    scale per output channel — the FP8 weight path of BASELINE config 3.

    Each weight W[..., in, out] becomes bits int8 + scale [..., 1, out];
    the engine applies y = (x @ decode(bits)) * scale, so the scale rides
    the small [rows, out] output instead of the weight. Dequant of the
    int8 bits fuses into the MXU operand read at serving batch sizes
    (XLA memory_analysis: temp == 0 — docs/PERF.md). Halves weight HBM:
    Llama-3-8B fits a single 16 GB chip. Embedding and norms stay in the
    model dtype (gathers/elementwise, not MXU operands)."""
    import numpy as np

    out = {}
    for name, w in params.items():
        if name not in _FP8_WEIGHT_NAMES:
            out[name] = w
            continue
        wf = np.asarray(w, np.float32)
        amax = np.abs(wf).max(axis=-2, keepdims=True)  # per output channel
        scale = np.maximum(amax, 1e-30) / 448.0
        bits = jax.lax.bitcast_convert_type(
            jnp.asarray(wf / scale).astype(jnp.float8_e4m3fn), jnp.int8
        )
        out[name] = bits
        out[name + "_scale"] = jnp.asarray(scale, jnp.float32)
    return out


def quantize_llama_weights_int8(params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Quantize matmul weights to LINEAR int8 with one f32 scale per output
    channel (amax/127) — the TPU-native 8-bit weight container.

    Pre-v6 TPUs have no fp8 hardware: the e4m3 path pays a 9-int-op/4-elem
    VPU bit decode on every weight read, while int8 -> bf16 is ONE hardware
    convert that XLA fuses into the MXU operand read. Same HBM footprint as
    e4m3 (8B fits one 16 GB chip), strictly cheaper dequant; per-channel
    int8 also carries more mantissa than e4m3 at equal range coverage.
    Scale key is ``name + "_iscale"`` (the engine dispatches on it).
    Reference analogue: the w8 weight-only paths of the engines the
    reference serves (its own containers are fp8 because Hopper/Blackwell
    have hardware fp8 — /root/reference/flashinfer/gemm.py bmm_fp8)."""
    import numpy as np

    out = {}
    for name, w in params.items():
        if name not in _FP8_WEIGHT_NAMES:
            out[name] = w
            continue
        wf = np.asarray(w, np.float32)
        amax = np.abs(wf).max(axis=-2, keepdims=True)  # per output channel
        scale = np.maximum(amax, 1e-30) / 127.0
        q = np.clip(np.rint(wf / scale), -127, 127).astype(np.int8)
        out[name] = jnp.asarray(q)
        out[name + "_iscale"] = jnp.asarray(scale, jnp.float32)
    return out


def llama_init_weights_int8(key: jax.Array, cfg: LlamaConfig) -> Dict[str, jax.Array]:
    """Generate int8-quantized weights directly on the device (the 8B
    single-chip path; see ``llama_init_weights_fp8`` for the rationale —
    bf16 weights never exist, nothing rides the slow host link). Same
    scheme as :func:`quantize_llama_weights_int8` (per-channel amax/127)."""
    import functools

    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hq, hkv, L = cfg.num_qo_heads, cfg.num_kv_heads, cfg.num_layers
    keys = jax.random.split(key, 8)
    scale0 = 1.0 / math.sqrt(h)

    def quant(w):  # w: f32 [in, out] -> (int8, f32 scale [1, out])
        amax = jnp.abs(w).max(axis=-2, keepdims=True)
        s = jnp.maximum(amax, 1e-30) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen_stacked(k, in_dim, out_dim):
        def body(c, kl):
            w = jax.random.normal(kl, (in_dim, out_dim), jnp.float32) * scale0
            return c, quant(w)

        _, (q, scales) = jax.lax.scan(body, 0, jax.random.split(k, L))
        return q, scales

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen_plain(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale0).astype(
            cfg.dtype)

    params: Dict[str, jax.Array] = {}
    for name, kk, in_dim, out_dim in (
        ("wq", keys[1], h, hq * d),
        ("wk", keys[2], h, hkv * d),
        ("wv", keys[3], h, hkv * d),
        ("wo", keys[4], hq * d, h),
        ("w_gate_up", keys[5], h, 2 * i),
        ("w_down", keys[6], i, h),
    ):
        q, s = gen_stacked(kk, in_dim, out_dim)
        params[name], params[name + "_iscale"] = q, s
    params["embedding"] = gen_plain(keys[0], (cfg.vocab_size, h))
    lm_q, lm_s = jax.jit(quant)(
        jax.random.normal(keys[7], (h, cfg.vocab_size), jnp.float32) * scale0)
    params["lm_head"], params["lm_head_iscale"] = lm_q, lm_s
    params["attn_norm"] = jnp.ones((L, h), cfg.dtype)
    params["mlp_norm"] = jnp.ones((L, h), cfg.dtype)
    params["final_norm"] = jnp.ones((h,), cfg.dtype)
    return params
