"""Pipeline parallelism: ppermute microbatch pipeline over the 'pp' axis.

Reference status: the reference ships ONLY the PP rank math
(comm/mapping.py pp_size / is_first_pp_rank etc.) and leaves the schedule
to engines. SURVEY §2.5's TPU plan calls for the actual mechanism: a
GPipe-style circular pipeline where stage s lives on mesh ring position s,
activations hop one ICI neighbor per tick via ``ppermute``, and the scan
over ticks lets XLA overlap the collective with the next stage's compute.

Bubble fraction is (pp - 1) / (num_microbatches + pp - 1): feed at least
~4x pp microbatches to amortize.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_forward"]


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
    shape-preserving. Returns [num_microbatches, mb, ...] outputs.
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
        # only the last stage holds real outputs; psum broadcasts them
        out = jnp.where(stage == pp - 1, out, 0)
        return jax.lax.psum(out, axis_name)

    spec_params = jax.tree_util.tree_map(lambda _: P(axis_name), stage_params)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_params, P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, x)
