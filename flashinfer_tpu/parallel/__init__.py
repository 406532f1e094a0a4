from flashinfer_tpu.parallel.mapping import Mapping
from flashinfer_tpu.parallel.mesh import (
    MeshContext,
    make_mesh,
    shard_kv_cache_spec,
    shard_model_specs,
)

__all__ = [
    "Mapping",
    "MeshContext",
    "make_mesh",
    "shard_model_specs",
    "shard_kv_cache_spec",
]
