"""Tensor-parallel paged serving decode over a jax.sharding.Mesh.

The reference ships the pieces of this path separately — Mapping rank math
(comm/mapping.py:21), custom allreduce + allreduce/RMSNorm fusion kernels
(comm/trtllm_ar.py:696,772) — and leaves assembly to engines. Here the
assembled TP decode step is part of the framework: Megatron-style head
sharding for attention (each device runs the paged Pallas kernel over its
local kv heads against its local cache shard), column/row-sharded MLP, and
the allreduce+residual+RMSNorm fusion from parallel/collectives.py at the
attention boundary. ICI collectives are XLA-scheduled (`psum` inside
shard_map) — no hand-written comm kernels needed on TPU.

Usage:
  params_tp = shard_llama_params_tp(params, mesh, cfg)
  step = make_tp_decode_step(mesh, cfg, plan_meta_local)
  logits, (k, v) = step(params_tp, kc, vc, tokens, positions, page_blob,
                        dplan_local)
where the attention plan is built with the LOCAL head counts (identical on
every device — the plan depends only on sequence lengths).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashinfer_tpu.models.llama import LlamaConfig
from flashinfer_tpu.ops.activation import silu_and_mul
from flashinfer_tpu.ops.attention.batch import run_device_plan
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.ops.page import append_paged_kv_cache
from flashinfer_tpu.ops.rope import apply_rope_pos_ids
from flashinfer_tpu.parallel.collectives import allreduce_rmsnorm
from flashinfer_tpu.utils import TensorLayout

__all__ = ["shard_llama_params_tp", "make_tp_decode_step", "tp_param_specs"]


def tp_param_specs(cfg: LlamaConfig) -> Dict[str, P]:
    """PartitionSpecs for Megatron-style TP over the 'tp' mesh axis.
    gate/up halves of w_gate_up are sharded independently (reshaped to
    [L, h, 2, inter] during placement so each shard holds matching
    gate||up channel blocks)."""
    return {
        "embedding": P(None, None),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "w_gate_up": P(None, None, None, "tp"),  # applied on [L, h, 2, i]
        "w_down": P(None, "tp", None),
        "attn_norm": P(None, None),
        "mlp_norm": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
    }


def shard_llama_params_tp(
    params: Dict[str, jax.Array], mesh: Mesh, cfg: LlamaConfig
) -> Dict[str, jax.Array]:
    """Place llama weights on the mesh with TP sharding. w_gate_up is
    resharded via a [L, h, 2, inter] view so silu_and_mul's gate/up split
    stays aligned per shard."""
    specs = tp_param_specs(cfg)
    out = {}
    for name, w in params.items():
        spec = specs[name]
        if name == "w_gate_up":
            L, h, two_i = w.shape
            w = w.reshape(L, h, 2, two_i // 2)
        out[name] = jax.device_put(w, NamedSharding(mesh, spec))
    return out


def make_tp_decode_step(
    mesh: Mesh,
    cfg: LlamaConfig,
    *,
    interpret: bool = False,
    kv_scale: float = 1.0,
    axis: str = "tp",
):
    """Build a jitted TP decode step.

    Returns step(params_tp, k_cache, v_cache, tokens, positions, valid,
                 kv_indices, kv_indptr, kv_last, dplan_local)
      -> (logits [B, vocab] f32 (tp-sharded on vocab), new_k, new_v)

    Caches are NHD [L, pages, page_size, kvh, d] sharded P(None, None, None,
    'tp', None); tokens/positions/page tables replicated; dplan_local is a
    DevicePlan built with the per-device head counts.
    """
    tp = mesh.shape[axis]
    assert cfg.num_kv_heads % tp == 0 and cfg.num_qo_heads % tp == 0
    hq_l = cfg.num_qo_heads // tp
    hkv_l = cfg.num_kv_heads // tp
    d, h = cfg.head_dim, cfg.hidden_size

    def local_step(params, k_cache, v_cache, tokens, positions, valid,
                   kv_indices, kv_indptr, kv_last, dplan):
        B = tokens.shape[0]
        x = params["embedding"][tokens]  # replicated
        new_k, new_v = [], []
        batch_indices = jnp.arange(B, dtype=jnp.int32)
        for layer in range(cfg.num_layers):
            xn = rmsnorm(x, params["attn_norm"][layer], cfg.rms_eps)
            q = (xn @ params["wq"][layer]).reshape(B, hq_l, d)
            k = (xn @ params["wk"][layer]).reshape(B, hkv_l, d)
            v = (xn @ params["wv"][layer]).reshape(B, hkv_l, d)
            q, k = apply_rope_pos_ids(q, k, positions,
                                      rope_theta=cfg.rope_theta)
            if kv_scale != 1.0:
                k = (k.astype(jnp.float32) / kv_scale).astype(k_cache.dtype)
                v = (v.astype(jnp.float32) / kv_scale).astype(v_cache.dtype)
            kc, vc = append_paged_kv_cache(
                k, v, batch_indices, positions,
                (k_cache[layer], v_cache[layer]),
                kv_indices, kv_indptr, kv_last, kv_layout="NHD", valid=valid,
            )
            new_k.append(kc)
            new_v.append(vc)
            attn = run_device_plan(
                dplan, q, kc, vc, kv_layout=TensorLayout.NHD,
                k_scale=kv_scale, v_scale=kv_scale, interpret=interpret,
            )
            # partial row-parallel projection; fused AR + residual + norm
            attn_partial = attn.reshape(B, hq_l * d) @ params["wo"][layer]
            xn2, x = allreduce_rmsnorm(
                attn_partial.astype(jnp.float32), x,
                params["mlp_norm"][layer], cfg.rms_eps, axis_name=axis,
            )
            w13 = params["w_gate_up"][layer]  # [h, 2, i_local]
            gate_up = jnp.einsum("bh,hti->bti", xn2, w13.astype(xn2.dtype))
            act = silu_and_mul(gate_up.reshape(B, -1))
            mlp_partial = act @ params["w_down"][layer]
            x = x + jax.lax.psum(mlp_partial.astype(jnp.float32), axis
                                 ).astype(x.dtype)
        x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
        logits = (x @ params["lm_head"]).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    specs = tp_param_specs(cfg)
    cache_spec = P(None, None, None, axis, None)
    rep = P()
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(specs, cache_spec, cache_spec, rep, rep, rep, rep, rep,
                  rep, rep),
        out_specs=(P(None, axis), cache_spec, cache_spec),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(1, 2))
