"""Context-parallel attention: ring (blockwise) and Ulysses (head-reshard).

The reference plumbs CP topology through Mapping but *rejects* attn_cp
(comm/mapping.py:161-164) and ships no ring kernel — long context is
handled per-GPU by split-KV. This module EXCEEDS the reference: true
cross-chip context parallelism over the ICI ring.

Design (shard_map over the 'cp' mesh axis):
  * ring_attention: KV is sequence-sharded; each step computes local
    attention state (v, s) against the resident KV shard, then ppermutes the
    shard to the next neighbor. States merge with the associative softmax
    algebra (state.py) — log(cp) of numerical depth, one ICI hop per step,
    compute and transfer overlap (XLA schedules ppermute ahead of the
    dependent dot).
  * ulysses_attention: all_to_all reshard seq↔heads so each device runs
    full-sequence attention on a head slice — the reference's "fallback to
    Ulysses" (mapping.py:150-153), implemented rather than implied.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flashinfer_tpu.ops.attention.kernels.flash import flash_attention_dense
from flashinfer_tpu.ops.attention.state import merge_state

__all__ = ["ring_attention", "ulysses_attention"]


def _local_ring_body(q, k, v, *, axis_name, causal, sm_scale, interpret):
    """Per-device body under shard_map. q/k/v: [local_len, heads, d].

    Per-shard compute is the dense Pallas flash kernel (kernels/flash.py),
    not the jnp oracle — this is a production long-context path. With
    causal masking the block structure is exploited per ring step: the
    diagonal shard runs the causal kernel, earlier shards run the mask-free
    kernel, later shards are skipped entirely (merge identity) via
    lax.cond, so only one kernel executes per step.
    """
    cp = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    local_q = q.shape[0]
    local_kv = k.shape[0]
    if causal:
        assert local_q == local_kv, (
            "causal ring attention needs equal q/kv sharding"
        )

    run = functools.partial(
        flash_attention_dense, sm_scale=sm_scale, interpret=interpret
    )

    def step(carry, i):
        k_cur, v_cur, v_acc, s_acc = carry
        # which rank's shard is resident after i hops (shards move +1 each
        # step, so at step i we hold the shard originally at my - i)
        src = (my - i) % cp

        if causal:
            # block-causal: diagonal -> causal kernel; below-diagonal ->
            # unmasked kernel; above-diagonal -> no work at all
            def diag(qkv):
                return run(*qkv, causal=True)

            def below_or_skip(qkv):
                def below(qkv):
                    return run(*qkv, causal=False)

                def skip(qkv):
                    qq, _, vv = qkv
                    return (
                        jnp.zeros(
                            (local_q, qq.shape[1], vv.shape[2]), qq.dtype
                        ),
                        jnp.full((local_q, qq.shape[1]), -jnp.inf,
                                 jnp.float32),
                    )

                return jax.lax.cond(src < my, below, skip, qkv)

            o, lse = jax.lax.cond(
                src == my, diag, below_or_skip, (q, k_cur, v_cur)
            )
        else:
            o, lse = run(q, k_cur, v_cur, causal=False)
        v_acc, s_acc = merge_state(v_acc, s_acc, o, lse)

        # rotate the shard to the next rank
        perm = [(j, (j + 1) % cp) for j in range(cp)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, v_acc, s_acc), None

    v0 = jnp.zeros((local_q, q.shape[1], v.shape[2]), q.dtype)
    s0 = jnp.full((local_q, q.shape[1]), -jnp.inf, jnp.float32)
    # initial carries must be marked varying over the ring axis or the scan
    # carry types mismatch (unvarying in, varying out)
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        v0 = pcast(v0, axis_name, to="varying")
        s0 = pcast(s0, axis_name, to="varying")
    else:  # older jax: jax.lax.pvary
        v0 = jax.lax.pvary(v0, (axis_name,))
        s0 = jax.lax.pvary(s0, (axis_name,))
    (k, v, v_acc, s_acc), _ = jax.lax.scan(
        step, (k, v, v0, s0), jnp.arange(cp)
    )
    return v_acc, s_acc


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "cp",
    causal: bool = False,
    sm_scale: Optional[float] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Sequence-parallel attention over the mesh's ``axis_name`` ring.

    q/k/v: [seq, heads, d] GLOBAL arrays (sharded or shardable on seq).
    Sequence length must divide evenly by the axis size.
    """
    spec = P(axis_name, None, None)
    body = functools.partial(
        _local_ring_body, axis_name=axis_name, causal=causal,
        sm_scale=sm_scale, interpret=interpret,
    )
    out, lse = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, P(axis_name, None)),
        # pallas_call inside shard_map can't express vma typing yet
        check_vma=False,
    )(q, k, v)
    return (out, lse) if return_lse else out


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "cp",
    causal: bool = False,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Ulysses SP: all_to_all seq-sharded q/k/v into head-sharded, run
    full-sequence attention locally (dense Pallas flash kernel), reshard
    back (the reference's attn-CP 'ulysses fallback', mapping.py:150-153)."""

    def body(q, k, v):
        # local: [seq/cp, heads, d] -> [seq, heads/cp, d]
        def to_heads(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=1, concat_axis=0, tiled=True
            )

        def to_seq(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=0, concat_axis=1, tiled=True
            )

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        o, _ = flash_attention_dense(
            qh, kh, vh, causal=causal, sm_scale=sm_scale,
            interpret=interpret,
        )
        return to_seq(o)

    spec = P(axis_name, None, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
