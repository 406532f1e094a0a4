"""Pipeline parallelism: ppermute microbatch pipeline over the 'pp' axis.

Reference status: the reference ships ONLY the PP rank math
(comm/mapping.py pp_size / is_first_pp_rank etc.) and leaves the schedule
to engines. SURVEY §2.5's TPU plan calls for the actual mechanism: a
GPipe-style circular pipeline where stage s lives on mesh ring position s,
activations hop one ICI neighbor per tick via ``ppermute``, and the scan
over ticks lets XLA overlap the collective with the next stage's compute.

Output delivery is pp-SHARDED: the local result carries a leading [1] stage
axis mapped to ``P(axis_name)``, so only the LAST stage's shard holds real
data and no collective broadcasts it (consumers slice ``[-1]`` — O(output)
traffic from one device, vs the previous psum broadcast). Activation shape
must be uniform across stages (an SPMD scan/ppermute constraint shared by
every production pipeline); shape-changing prologue/epilogue (embedding,
lm_head) run OUTSIDE the ring — see :func:`llama_forward_pipelined` for the
full-model composition.

Bubble fraction is (pp - 1) / (num_microbatches + pp - 1): feed at least
~4x pp microbatches to amortize.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_forward", "llama_forward_pipelined"]


def pipeline_forward(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,  # [num_microbatches, mb, ...] (replicated input)
    mesh: Mesh,
    *,
    axis_name: str = "pp",
):
    """Run ``stage_fn`` as a pp-deep pipeline over microbatches.

    stage_params: pytree whose leaves have a leading ``pp`` axis (stage s's
    parameters live on ring position s; pass sharded arrays for real
    placement). stage_fn(params_for_stage, activations) -> activations,
    shape-preserving. Returns [num_microbatches, mb, ...] outputs (the
    data lives on the last stage; reading it moves O(output) bytes once).
    """
    pp = mesh.shape[axis_name]
    num_micro = x.shape[0]
    assert num_micro >= 1

    def body(params, xs):
        # params leaves arrive as [1, ...] local slices
        params_local = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis_name)
        fwd = [(i, (i + 1) % pp) for i in range(pp)]

        state0 = jnp.zeros_like(xs[0])
        out0 = jnp.zeros_like(xs)

        def tick(carry, t):
            state, out = carry
            # first stage ingests microbatch t (clamped; masked later)
            feed = xs[jnp.clip(t, 0, num_micro - 1)]
            state = jnp.where(stage == 0, feed, state)
            y = stage_fn(params_local, state)
            # last stage emits microbatch t - (pp - 1)
            mb = t - (pp - 1)
            is_out = jnp.logical_and(stage == pp - 1, mb >= 0)
            out = jax.lax.cond(
                is_out,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.clip(mb, 0, num_micro - 1), 0
                ),
                lambda o: o,
                out,
            )
            # activations hop to the next ring neighbor
            state = jax.lax.ppermute(y, axis_name, fwd)
            return (state, out), ()

        (_, out), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(num_micro + pp - 1)
        )
        # leading [1] stage axis -> P(axis_name): the result stays sharded;
        # non-last stages contribute garbage shards nobody reads
        return out[None]

    spec_params = jax.tree_util.tree_map(lambda _: P(axis_name), stage_params)
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_params, P()),
        out_specs=P(axis_name),
        check_vma=False,
    )(stage_params, x)
    return out[-1]


def llama_forward_pipelined(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # [batch, seq]
    cfg,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis_name: str = "pp",
) -> jax.Array:
    """Full pp-sharded Llama forward ≡ ``llama_forward_dense``.

    The transformer trunk runs as a pp-deep microbatch pipeline: the
    [L, ...] stacked weights regroup as [pp, L/pp, ...] (stage s holds
    layers s*L/pp..(s+1)*L/pp, sharded over the pp axis), each stage applies
    its L/pp layers per tick. The shape-changing ends — embedding gather and
    final-norm + lm_head — run outside the ring (cheap gather / one GEMM on
    the pipeline output). Reference scope: Mapping's pp rank math only
    (comm/mapping.py); the schedule itself exceeds reference."""
    from flashinfer_tpu.models.llama import (
        _LLAMA_PER_LAYER,
        llama_dense_layer,
    )
    from flashinfer_tpu.ops.norm import rmsnorm

    pp = mesh.shape[axis_name]
    L = cfg.num_layers
    assert L % pp == 0, (L, pp)
    per_stage = L // pp
    B, S = token_ids.shape
    assert B % num_microbatches == 0, (B, num_microbatches)
    mb = B // num_microbatches

    stage_params = {
        k: params[k].reshape((pp, per_stage) + params[k].shape[1:])
        for k in _LLAMA_PER_LAYER if k in params
    }
    x = params["embedding"][token_ids]  # [B, S, h]
    x = x.reshape(num_microbatches, mb, S, -1)
    pos = jnp.arange(S, dtype=jnp.int32)

    def stage_fn(sp, h):
        for i in range(per_stage):
            lp = {k: v[i] for k, v in sp.items()}
            h = llama_dense_layer(lp, h, pos, cfg)
        return h

    x = pipeline_forward(
        stage_fn, stage_params, x, mesh, axis_name=axis_name
    )
    x = x.reshape(B, S, -1)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)
