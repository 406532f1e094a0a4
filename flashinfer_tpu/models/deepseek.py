"""DeepSeek-family model: MLA attention + DeepSeek-V3 MoE FFN.

Exercises the framework's MLA path end to end (the reference ships MLA
kernels for exactly this family: flashinfer/mla.py:85, mla.cuh:777, and the
DeepSeekV3 routing method, fused_moe/core.py:62).

Two execution paths:
  * ``deepseek_forward_dense`` — dense causal oracle (einsum attention over
    the compressed cache, no paging); the test/reference path and the
    multi-chip shardable path.
  * ``deepseek_decode_step`` — paged serving decode over (ckv, kpe) caches
    via ``BatchMLAPagedAttentionWrapper`` + ``append_paged_mla_kv_cache``.

MLA math (matrix-absorbed, DeepSeek-V2 §2.1):
  c_kv = x W_dkv                  (per token, d_ckv dims — cached)
  k_pe = RoPE(x W_kpe)            (d_kpe dims — cached)
  q_nope, q_pe = heads of (x W_q)
  score_h = (q_nope_h W_uk_h) · c_kv + RoPE(q_pe_h) · k_pe
  out_h   = softmax(score) · c_kv, then W_uv_h projects back
so decode attends in the compressed space: per-token cache traffic is
d_ckv + d_kpe elements total, shared by all heads.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.activation import silu_and_mul
from flashinfer_tpu.ops.fused_moe import RoutingMethodType, fused_moe, route_tokens
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.ops.rope import apply_rope_pos_ids

__all__ = [
    "DeepSeekConfig",
    "deepseek_init_weights",
    "deepseek_forward_dense",
    "deepseek_decode_step",
]


@dataclasses.dataclass(frozen=True)
class DeepSeekConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 4
    num_heads: int = 16
    head_dim_ckv: int = 512  # compressed KV (shared across heads; = V dim)
    head_dim_kpe: int = 64  # rope'd key part
    head_dim_qk_nope: int = 128  # per-head pre-absorption q/k dim
    # MoE
    num_experts: int = 8
    num_shared_experts: int = 1
    top_k: int = 2
    moe_inter_size: int = 1408
    n_group: int = 4
    topk_group: int = 2
    routed_scaling_factor: float = 1.0
    rope_theta: float = 1e4
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny(dtype=jnp.float32) -> "DeepSeekConfig":
        return DeepSeekConfig(
            vocab_size=128,
            hidden_size=64,
            num_layers=2,
            num_heads=2,
            head_dim_ckv=32,
            head_dim_kpe=16,
            head_dim_qk_nope=16,
            num_experts=4,
            num_shared_experts=1,
            top_k=2,
            moe_inter_size=32,
            n_group=2,
            topk_group=1,
            dtype=dtype,
        )


def deepseek_init_weights(key, cfg: DeepSeekConfig) -> Dict[str, jax.Array]:
    h, L = cfg.hidden_size, cfg.num_layers
    nh = cfg.num_heads
    dc, dp, dn = cfg.head_dim_ckv, cfg.head_dim_kpe, cfg.head_dim_qk_nope
    e, i = cfg.num_experts, cfg.moe_inter_size
    keys = jax.random.split(key, 12)
    s = 1.0 / math.sqrt(h)

    def rnd(k, shape, scale=None):
        return (jax.random.normal(k, shape, jnp.float32)
                * (scale or s)).astype(cfg.dtype)

    return {
        "embedding": rnd(keys[0], (cfg.vocab_size, h)),
        # attention: q heads (nope + pe parts), compressed kv projections
        "w_q": rnd(keys[1], (L, h, nh * (dn + dp))),
        "w_dkv": rnd(keys[2], (L, h, dc)),
        "w_kpe": rnd(keys[3], (L, h, dp)),
        "w_uk": rnd(keys[4], (L, nh, dn, dc), 1.0 / math.sqrt(dn)),
        "w_uv": rnd(keys[5], (L, nh, dc, dn), 1.0 / math.sqrt(dc)),
        "w_o": rnd(keys[6], (L, nh * dn, h)),
        # MoE: routed experts + shared expert (dense)
        "router": rnd(keys[7], (L, h, e), 1.0),
        "w13": rnd(keys[8], (L, e, 2 * i, h)),
        "w2": rnd(keys[9], (L, e, h, i)),
        "w13_shared": rnd(keys[10], (L, h, 2 * i * cfg.num_shared_experts)),
        "w2_shared": rnd(keys[11], (L, i * cfg.num_shared_experts, h)),
        "attn_norm": jnp.ones((L, h), cfg.dtype),
        "ffn_norm": jnp.ones((L, h), cfg.dtype),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": rnd(keys[0], (h, cfg.vocab_size)),
    }


def _mla_qkv(params, cfg, layer, xn, positions, rope: bool = True):
    """Common projections: returns absorbed q_nope [n, nh, dc],
    q_pe [n, nh, dp], c_kv [n, dc], k_pe [n, dp] (rope applied unless
    rope=False — the fp8 path defers rope to the fused
    mla_rope_quantize_fp8 prologue)."""
    n = xn.shape[0]
    nh, dn, dp, dc = (cfg.num_heads, cfg.head_dim_qk_nope,
                      cfg.head_dim_kpe, cfg.head_dim_ckv)
    q = (xn @ params["w_q"][layer]).reshape(n, nh, dn + dp)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    c_kv = xn @ params["w_dkv"][layer]  # [n, dc]
    k_pe = xn @ params["w_kpe"][layer]  # [n, dp]
    # absorb W_uk into q: q_abs[h] = q_nope[h] @ W_uk[h]
    q_abs = jnp.einsum("nhd,hdc->nhc", q_nope, params["w_uk"][layer])
    if not rope:
        return q_abs.astype(xn.dtype), q_pe, c_kv, k_pe
    # rope on the pe parts (k_pe is single-"head")
    q_pe, k_pe_r = apply_rope_pos_ids(
        q_pe, k_pe[:, None, :], positions, rope_theta=cfg.rope_theta
    )
    return q_abs.astype(xn.dtype), q_pe, c_kv, k_pe_r[:, 0]


def _moe_ffn(params, cfg, layer, xn):
    ids, scales = route_tokens(
        xn.astype(jnp.float32) @ params["router"][layer].astype(jnp.float32),
        cfg.top_k,
        RoutingMethodType.DeepSeekV3,
        n_group=cfg.n_group,
        topk_group=cfg.topk_group,
        routed_scaling_factor=cfg.routed_scaling_factor,
    )
    routed = fused_moe(
        xn, params["w13"][layer], params["w2"][layer], ids, scales
    )
    shared = silu_and_mul(xn @ params["w13_shared"][layer]) @ \
        params["w2_shared"][layer]
    return routed + shared.astype(routed.dtype)


def deepseek_forward_dense(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [batch, seq]
    cfg: DeepSeekConfig,
) -> jax.Array:
    """Dense causal oracle. Attention runs in the compressed space with an
    explicit softmax (numerics identical to the paged MLA kernel's math)."""
    B, S = token_ids.shape
    x = params["embedding"][token_ids]
    pos = jnp.arange(S, dtype=jnp.int32)
    sm_scale = 1.0 / math.sqrt(cfg.head_dim_qk_nope + cfg.head_dim_kpe)

    causal = (pos[None, :] <= pos[:, None])[None]  # [1, S, S]

    for layer in range(cfg.num_layers):
        xn = rmsnorm(x, params["attn_norm"][layer], cfg.rms_eps)
        xn2 = xn.reshape(B * S, -1)
        q_abs, q_pe, c_kv, k_pe = jax.vmap(
            lambda xr: _mla_qkv(params, cfg, layer, xr, pos)
        )(xn.reshape(B, S, -1))
        # q_abs [B,S,nh,dc], c_kv [B,S,dc], k_pe [B,S,dp]
        s = (
            jnp.einsum("bqhc,bkc->bhqk", q_abs.astype(jnp.float32),
                       c_kv.astype(jnp.float32))
            + jnp.einsum("bqhp,bkp->bhqk", q_pe.astype(jnp.float32),
                         k_pe.astype(jnp.float32))
        ) * sm_scale
        s = jnp.where(causal[:, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        attn_c = jnp.einsum("bhqk,bkc->bqhc", p,
                            c_kv.astype(jnp.float32))  # compressed-space out
        attn = jnp.einsum("bqhc,hcd->bqhd", attn_c,
                          params["w_uv"][layer].astype(jnp.float32))
        attn = attn.reshape(B, S, -1).astype(x.dtype)
        x = x + (attn @ params["w_o"][layer]).astype(x.dtype)

        xn = rmsnorm(x, params["ffn_norm"][layer], cfg.rms_eps)
        # flatten tokens: ragged_dot has no batch-vmap rule
        ffn = _moe_ffn(params, cfg, layer, xn.reshape(B * S, -1))
        x = x + ffn.reshape(B, S, -1).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def deepseek_decode_step(
    params: Dict[str, jax.Array],
    cfg: DeepSeekConfig,
    token_ids: jax.Array,  # [batch]
    positions: jax.Array,  # [batch]
    ckv_caches: jax.Array,  # [L, pages, page_size, d_ckv]
    kpe_caches: jax.Array,  # [L, pages, page_size, d_kpe]
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array,
    mla_wrappers,  # list of planned BatchMLAPagedAttentionWrapper (per layer
    #               or a single shared one; plan covers this step's batch)
    *,
    interpret: Optional[bool] = None,
    kv_scale: float = 1.0,
    cos_sin_cache: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One paged decode step. Returns (logits, new_ckv, new_kpe).

    FP8 serving (reference config 4 + fp8, decode.py:2298): pass int8
    ckv/kpe caches (e4m3 bit containers), the dequant ``kv_scale``, and a
    ``cos_sin_cache`` ([max_pos, d_kpe] f32, rope_cos_sin_cache) — new
    tokens then run the fused ``mla_rope_quantize_fp8`` prologue (rope +
    quantize in one elementwise pass) and attention consumes the quantized
    cache via the in-kernel bit decode."""
    from flashinfer_tpu.ops.page import append_paged_mla_kv_cache
    from flashinfer_tpu.ops.rope import mla_rope_quantize_fp8

    fp8 = ckv_caches.dtype == jnp.int8
    B = token_ids.shape[0]
    x = params["embedding"][token_ids]
    batch_indices = jnp.arange(B, dtype=jnp.int32)
    new_ckv, new_kpe = [], []
    for layer in range(cfg.num_layers):
        w = mla_wrappers[layer] if isinstance(mla_wrappers, (list, tuple)) \
            else mla_wrappers
        xn = rmsnorm(x, params["attn_norm"][layer], cfg.rms_eps)
        if fp8:
            assert cos_sin_cache is not None, (
                "fp8 MLA decode needs a cos_sin_cache for the fused "
                "rope+quantize prologue"
            )
            q_abs, q_pe_raw, c_kv, k_pe_raw = _mla_qkv(
                params, cfg, layer, xn, positions, rope=False
            )
            q_pe, k_pe, _, c_kv = mla_rope_quantize_fp8(
                q_pe_raw, k_pe_raw, q_abs, c_kv, cos_sin_cache, positions,
                quantize_dtype=jnp.int8,
                quant_scale_kv=1.0 / kv_scale,
                quantize_q=False,
            )
        else:
            q_abs, q_pe, c_kv, k_pe = _mla_qkv(
                params, cfg, layer, xn, positions
            )
        ckv_c, kpe_c = append_paged_mla_kv_cache(
            c_kv, k_pe, batch_indices, positions,
            ckv_caches[layer], kpe_caches[layer],
            kv_indices, kv_indptr, kv_last_page_len,
        )
        new_ckv.append(ckv_c)
        new_kpe.append(kpe_c)
        attn_c = w.run(q_abs, q_pe, ckv_c, kpe_c, interpret=interpret,
                       ckv_scale=kv_scale, kpe_scale=kv_scale)
        attn = jnp.einsum(
            "nhc,hcd->nhd", attn_c.astype(jnp.float32),
            params["w_uv"][layer].astype(jnp.float32),
        ).reshape(B, -1).astype(x.dtype)
        x = x + (attn @ params["w_o"][layer]).astype(x.dtype)
        xn = rmsnorm(x, params["ffn_norm"][layer], cfg.rms_eps)
        x = x + _moe_ffn(params, cfg, layer, xn).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, jnp.stack(new_ckv), jnp.stack(new_kpe)
