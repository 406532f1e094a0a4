"""Worker for the multi-process distributed-serving test: each process owns
4 CPU devices of an 8-device dp x tp mesh and runs identical host
scheduling; SPMD executes across processes over jax.distributed."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from flashinfer_tpu.models.llama import LlamaConfig
from flashinfer_tpu.serving import EngineConfig
from flashinfer_tpu.serving.distributed import DistributedServingEngine

assert jax.device_count() == 8, jax.device_count()
mc = LlamaConfig(
    vocab_size=256, hidden_size=64, num_layers=2, num_qo_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128, dtype=jnp.float32,
)
cfg = EngineConfig(model=mc, max_batch=2, num_pages=64, page_size=8,
                   max_seq_len=128, greedy=True, interpret=True)
mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "tp"))
eng = DistributedServingEngine(cfg, mesh, seed=0)
reqs = [
    eng.add_request([1, 2, 3, 4, 5], 4),
    eng.add_request([7, 8, 9], 3),
    eng.add_request([11, 12, 13], 4),
]
eng.run_to_completion(max_steps=32)
for r in reqs:
    assert r.done
print("TOKENS", pid, [r.output for r in reqs], flush=True)
