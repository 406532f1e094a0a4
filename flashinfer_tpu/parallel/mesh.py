"""Mapping → jax.sharding.Mesh views and canonical PartitionSpecs.

TPU-first realization of the reference's comm layer: instead of rank lists +
custom allreduce kernels, a `Mapping` becomes device meshes and shardings;
XLA inserts the ICI collectives (the role of trtllm_custom_all_reduce etc.,
comm/trtllm_ar.py:696) and overlaps them with compute.

Two mesh views share the same devices:
  * attention/dense view: axes (dp, pp, cp, tp)
  * MoE view:             axes (dp, pp, ep, moe_tp)  — the (cp×tp) sub-grid
    refactored, mirroring mapping.py's moe groups.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashinfer_tpu.parallel.mapping import Mapping

__all__ = ["make_mesh", "MeshContext", "shard_model_specs", "shard_kv_cache_spec"]


@dataclasses.dataclass
class MeshContext:
    mapping: Mapping
    mesh: Mesh  # (dp, pp, cp, tp)
    moe_mesh: Mesh  # (dp, pp, ep, moe_tp)

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def moe_sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.moe_mesh, P(*spec))


def make_mesh(
    mapping: Mapping, devices: Optional[Sequence[jax.Device]] = None
) -> MeshContext:
    """Build the mesh views for a Mapping. Device order follows the
    reference's row-major (dp, pp, cp, tp) rank layout so rank r ==
    devices[r]."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < mapping.world_size:
        raise ValueError(
            f"need {mapping.world_size} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[: mapping.world_size]).reshape(
        mapping.dp_size, mapping.pp_size, mapping.cp_size, mapping.tp_size
    )
    mesh = Mesh(dev, ("dp", "pp", "cp", "tp"))
    dev_moe = dev.reshape(
        mapping.dp_size, mapping.pp_size, mapping.moe_ep_size, mapping.moe_tp_size
    )
    moe_mesh = Mesh(dev_moe, ("dp", "pp", "ep", "moe_tp"))
    return MeshContext(mapping=mapping, mesh=mesh, moe_mesh=moe_mesh)


def shard_model_specs(hidden_axis: str = "tp") -> Dict[str, P]:
    """Canonical megatron-style specs for a transformer block: column-parallel
    up/qkv projections, row-parallel down/output projections."""
    return {
        "embedding": P(None, hidden_axis),
        "wq": P(None, hidden_axis),
        "wk": P(None, hidden_axis),
        "wv": P(None, hidden_axis),
        "wo": P(hidden_axis, None),
        "w_gate_up": P(None, hidden_axis),
        "w_down": P(hidden_axis, None),
        "norm": P(None),
        "lm_head": P(None, hidden_axis),
        # MoE expert weights: experts over ep, hidden over moe_tp
        "moe_w1": P("ep", None, "moe_tp"),
        "moe_w2": P("ep", "moe_tp", None),
    }


def shard_kv_cache_spec() -> P:
    """Paged KV cache [pages, kvh, page_size, d]: heads sharded over tp,
    pages replicated within tp group, sharded over dp (each dp replica owns
    its own requests)."""
    return P(None, "tp", None, None)
