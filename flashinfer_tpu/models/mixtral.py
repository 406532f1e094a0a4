"""Mixtral-family model: GQA attention + top-2 renormalized MoE FFN.

Exercises the fused-MoE path (reference cutlass_fused_moe,
fused_moe/core.py:758, Renormalize routing core.py:62) together with the
paged GQA attention stack. Structure mirrors models/llama.py: a dense
causal oracle (``mixtral_forward_dense``) and a paged serving decode step
(``mixtral_decode_step``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.fused_moe import RoutingMethodType, fused_moe, route_tokens
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.ops.rope import apply_rope_pos_ids

__all__ = [
    "MixtralConfig",
    "mixtral_init_weights",
    "mixtral_forward_dense",
    "mixtral_decode_step",
]


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_qo_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    num_experts: int = 8
    top_k: int = 2
    moe_inter_size: int = 14336
    rope_theta: float = 1e6
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny(dtype=jnp.float32) -> "MixtralConfig":
        return MixtralConfig(
            vocab_size=128,
            hidden_size=64,
            num_layers=2,
            num_qo_heads=4,
            num_kv_heads=2,
            head_dim=16,
            num_experts=4,
            top_k=2,
            moe_inter_size=32,
            dtype=dtype,
        )


def mixtral_init_weights(key, cfg: MixtralConfig) -> Dict[str, jax.Array]:
    h, d, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    hq, hkv = cfg.num_qo_heads, cfg.num_kv_heads
    e, i = cfg.num_experts, cfg.moe_inter_size
    keys = jax.random.split(key, 9)
    s = 1.0 / math.sqrt(h)

    def rnd(k, shape, scale=None):
        return (jax.random.normal(k, shape, jnp.float32)
                * (scale or s)).astype(cfg.dtype)

    return {
        "embedding": rnd(keys[0], (cfg.vocab_size, h)),
        "wq": rnd(keys[1], (L, h, hq * d)),
        "wk": rnd(keys[2], (L, h, hkv * d)),
        "wv": rnd(keys[3], (L, h, hkv * d)),
        "wo": rnd(keys[4], (L, hq * d, h)),
        "router": rnd(keys[5], (L, h, e), 1.0),
        "w13": rnd(keys[6], (L, e, 2 * i, h)),
        "w2": rnd(keys[7], (L, e, h, i)),
        "attn_norm": jnp.ones((L, h), cfg.dtype),
        "ffn_norm": jnp.ones((L, h), cfg.dtype),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": rnd(keys[8], (h, cfg.vocab_size)),
    }


def _moe_ffn(params, cfg, layer, xn):
    ids, scales = route_tokens(
        xn.astype(jnp.float32) @ params["router"][layer].astype(jnp.float32),
        cfg.top_k,
        RoutingMethodType.Renormalize,
    )
    return fused_moe(xn, params["w13"][layer], params["w2"][layer], ids, scales)


def mixtral_forward_dense(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [batch, seq]
    cfg: MixtralConfig,
) -> jax.Array:
    B, S = token_ids.shape
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_qo_heads, cfg.num_kv_heads
    x = params["embedding"][token_ids]
    pos = jnp.arange(S, dtype=jnp.int32)

    for layer in range(cfg.num_layers):
        xn = rmsnorm(x, params["attn_norm"][layer], cfg.rms_eps)
        q = (xn @ params["wq"][layer]).reshape(B, S, hq, d)
        k = (xn @ params["wk"][layer]).reshape(B, S, hkv, d)
        v = (xn @ params["wv"][layer]).reshape(B, S, hkv, d)
        q, k = jax.vmap(
            lambda q1, k1: apply_rope_pos_ids(q1, k1, pos,
                                              rope_theta=cfg.rope_theta)
        )(q, k)
        attn = jax.vmap(
            lambda q1, k1, v1: attention_reference(q1, k1, v1, causal=True)[0]
        )(q, k, v)
        x = x + (attn.reshape(B, S, hq * d) @ params["wo"][layer]).astype(x.dtype)

        xn = rmsnorm(x, params["ffn_norm"][layer], cfg.rms_eps)
        # flatten tokens: ragged_dot has no batch-vmap rule
        ffn = _moe_ffn(params, cfg, layer, xn.reshape(B * S, -1))
        x = x + ffn.reshape(B, S, -1).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def mixtral_decode_step(
    params: Dict[str, jax.Array],
    cfg: MixtralConfig,
    token_ids: jax.Array,  # [batch]
    positions: jax.Array,  # [batch]
    kv_caches: Tuple[jax.Array, jax.Array],  # NHD [L, pages, ps, hkv, d] x2
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array,
    decode_wrapper,  # planned BatchDecodeWithPagedKVCacheWrapper (NHD)
    *,
    interpret: Optional[bool] = None,
    moe_fn=None,  # (params, cfg, layer, xn) -> ffn out; defaults to the
    # single-device _moe_ffn. Parallel deployments inject an EP / MoE-TP
    # sharded layer here (parallel/moe.py fused_moe_ep) — the same
    # composition point the reference exposes via cutlass_fused_moe's
    # tp/ep args (fused_moe/core.py:758).
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One paged decode step. Returns (logits, (new_k, new_v))."""
    from flashinfer_tpu.ops.page import append_paged_kv_cache

    B = token_ids.shape[0]
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_qo_heads, cfg.num_kv_heads
    if moe_fn is None:
        moe_fn = _moe_ffn
    x = params["embedding"][token_ids]
    k_all, v_all = kv_caches
    batch_indices = jnp.arange(B, dtype=jnp.int32)
    new_k, new_v = [], []

    for layer in range(cfg.num_layers):
        xn = rmsnorm(x, params["attn_norm"][layer], cfg.rms_eps)
        q = (xn @ params["wq"][layer]).reshape(B, hq, d)
        k = (xn @ params["wk"][layer]).reshape(B, hkv, d)
        v = (xn @ params["wv"][layer]).reshape(B, hkv, d)
        q, k = apply_rope_pos_ids(q, k, positions, rope_theta=cfg.rope_theta)
        kc, vc = append_paged_kv_cache(
            k, v, batch_indices, positions, (k_all[layer], v_all[layer]),
            kv_indices, kv_indptr, kv_last_page_len, kv_layout="NHD",
        )
        new_k.append(kc)
        new_v.append(vc)
        attn = decode_wrapper.run(q, (kc, vc), interpret=interpret)
        x = x + (attn.reshape(B, hq * d) @ params["wo"][layer]).astype(x.dtype)

        xn = rmsnorm(x, params["ffn_norm"][layer], cfg.rms_eps)
        x = x + moe_fn(params, cfg, layer, xn).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, (jnp.stack(new_k), jnp.stack(new_v))
