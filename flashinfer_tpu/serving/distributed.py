"""Multi-device / multi-host serving: dp×tp continuous batching.

Reference role: the reference treats multi-GPU serving as first-class via
its comm kernels (comm/trtllm_ar.py:696 allreduce fusions, comm/mnnvl.py:226
multi-node buffers, comm/nvshmem.py:72) and leaves engine assembly to
callers. The TPU equivalent is SPMD: ONE jitted step over a
``jax.sharding.Mesh`` with axes ('dp', 'tp') — data-parallel replicas each
serving their own continuous batch, tensor parallelism inside each replica
over ICI, ``jax.distributed`` carrying the multi-host bootstrap (DCN).

Design (TPU-first):
  * Unified prefill+decode step: every global step, each dp replica plans
    its admissions (qo_len = prompt_len) AND its running decodes
    (qo_len = 1) into one BatchAttention work list — the holistic/POD path.
    All replicas therefore execute the same program every step, which is
    what SPMD requires; bucket floors (min_bucket_rows / work_capacity /
    min_max_splits) pin the PlanMeta so the jit never retraces across
    batch mixes or replicas.
  * Caches: one array [dp, L*pages, page_size, kvh, d] sharded
    P('dp', None, None, 'tp', None) — each replica owns its page space,
    each tp shard its kv heads. Donated across steps.
  * Per-step host work is ONE int32 blob per replica, stacked [dp, N]:
    a single H2D upload regardless of dp (the tunneled-device lesson).
  * Sampling happens inside the jit on the tp-sharded lm_head: greedy =
    segmented argmax + tp all_gather of (max, idx) pairs; sampled = gather
    the [B, vocab] row (B is small) and run the fused sampler.

Multi-host: call ``bootstrap_distributed()`` first (jax.distributed), build
the mesh over ``jax.devices()`` (all processes), and feed requests on every
process — jit executes the same SPMD program on each host's shards.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashinfer_tpu.models.llama import LlamaConfig, llama_init_weights
from flashinfer_tpu.ops.activation import silu_and_mul
from flashinfer_tpu.ops.attention.batch import (
    BatchAttention,
    DevicePlan,
    run_device_plan,
)
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.ops.rope import apply_rope_pos_ids
from flashinfer_tpu.ops.sampling import softmax, top_k_top_p_sampling_from_probs
from flashinfer_tpu.parallel.collectives import allreduce_rmsnorm
from flashinfer_tpu.parallel.tp_serving import tp_param_specs
from flashinfer_tpu.scheduler.native import PagePool
from flashinfer_tpu.serving.engine import EngineConfig, GenerationRequest
from flashinfer_tpu.utils import TensorLayout, next_power_of_2, on_tpu

__all__ = ["bootstrap_distributed", "DistributedServingEngine"]


def _global_array(arr, mesh: Mesh, spec: P):
    """Create a mesh-global array from identical host data on every
    process (multi-host: each process contributes its addressable shards;
    single-process: plain device_put)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    host = np.asarray(arr)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def bootstrap_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed for multi-host serving (the role MPI /
    torch.distributed bootstrap plays for the reference, comm/mnnvl.py:199).

    Arguments default to the JAX_* environment variables
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID); a no-op
    for single-process runs. Returns the process index."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit and jax.process_count() == 1 and not getattr(
        bootstrap_distributed, "_done", False
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        bootstrap_distributed._done = True
    return jax.process_index()


@dataclasses.dataclass
class _Replica:
    """Host-side scheduling state of one dp replica."""

    pool: PagePool
    slots: List[Optional[GenerationRequest]]
    pending: List[GenerationRequest] = dataclasses.field(default_factory=list)
    new_this_step: set = dataclasses.field(default_factory=set)


class DistributedServingEngine:
    """Continuous-batching engine over a ('dp', 'tp') mesh.

    Per-replica request queues with one SPMD device step. Greedy tokens
    match the single-chip ``LlamaServingEngine`` (modulo TP reduction
    order)."""

    def __init__(
        self,
        config: EngineConfig,
        mesh: Mesh,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
        max_tokens_per_step: Optional[int] = None,
    ):
        self.cfg = config
        self.mesh = mesh
        mc = config.model
        self.dp = mesh.shape["dp"]
        self.tp = mesh.shape["tp"]
        assert mc.num_kv_heads % self.tp == 0, (mc.num_kv_heads, self.tp)
        assert mc.num_qo_heads % self.tp == 0

        host_params = params or llama_init_weights(jax.random.key(seed), mc)
        # tp-shard weights (replicated over dp); w_gate_up resharded via
        # [L, h, 2, inter] so gate/up halves stay aligned per shard
        specs = tp_param_specs(mc)
        self.params = {}
        for name, w in host_params.items():
            if name == "w_gate_up":
                L, h, two_i = w.shape
                w = w.reshape(L, h, 2, two_i // 2)
            self.params[name] = _global_array(w, mesh, specs[name])

        # explicit 8-bit-mode discriminator (never inferred from kv_scale's
        # value): False | "e4m3" | "int8" (see serving/engine.py)
        self._kv_fp8 = {"fp8_e4m3": "e4m3", "int8": "int8"}.get(
            config.kv_dtype, False)
        if self._kv_fp8:
            cache_dtype = jnp.int8  # 8-bit container
            from flashinfer_tpu.serving.engine import _norm_kv_scale

            self._kv_scale = _norm_kv_scale(config.kv_scale)
        else:
            cache_dtype = mc.dtype
            self._kv_scale = (1.0, 1.0)
        cache_shape = (
            self.dp,
            mc.num_layers * config.num_pages,
            config.page_size,
            mc.num_kv_heads,
            mc.head_dim,
        )
        cache_spec = P("dp", None, None, "tp", None)
        self.k_cache = _global_array(
            np.zeros(cache_shape, cache_dtype), mesh, cache_spec
        )
        self.v_cache = _global_array(
            np.zeros(cache_shape, cache_dtype), mesh, cache_spec
        )

        self._reps = [
            _Replica(
                PagePool(config.num_pages, config.page_size),
                [None] * config.max_batch,
            )
            for _ in range(self.dp)
        ]
        self._rr = 0
        self._next_id = 0
        self.key = jax.random.key(seed + 1)
        self._interpret = (
            config.interpret if config.interpret is not None else not on_tpu()
        )
        self._page_bucket = next_power_of_2(config.num_pages)

        # --- static step-shape configuration (identical on every replica,
        # every step — the SPMD contract) ---
        group = mc.num_qo_heads // mc.num_kv_heads
        self._tile_q = max(8, next_power_of_2(group))
        self._kv_chunk = min(2048, next_power_of_2(config.max_seq_len))
        self._rows = next_power_of_2(
            max(max_tokens_per_step or 4 * config.max_batch, 8)
        )
        B = config.max_batch
        chunks = -(-config.max_seq_len // self._kv_chunk)
        tiles = self._rows * group // self._tile_q + B + 2
        self._work_capacity = next_power_of_2(max(8, tiles * chunks))
        self._min_bucket_rows = next_power_of_2(
            self._rows * group + (B + 2) * self._tile_q
        )
        self._min_splits = next_power_of_2(chunks)
        self._group = group
        self.steps = 0
        self.generated_tokens = 0

    # ------------------------------------------------------------------ API

    def add_request(self, prompt, max_new_tokens: int,
                    replica: Optional[int] = None) -> GenerationRequest:
        total = len(prompt) + max_new_tokens
        if total > self.cfg.max_seq_len:
            raise ValueError(
                f"prompt+max_new_tokens={total} > max_seq_len"
                f"={self.cfg.max_seq_len}"
            )
        if len(prompt) > self._rows:
            raise ValueError(
                f"prompt_len {len(prompt)} > max_tokens_per_step {self._rows}"
            )
        req = GenerationRequest(list(map(int, prompt)), max_new_tokens)
        req.request_id = self._next_id
        self._next_id += 1
        r = self._rr % self.dp if replica is None else replica
        self._rr += 1
        self._reps[r].pending.append(req)
        return req

    @property
    def num_running(self) -> int:
        return sum(
            s is not None for rep in self._reps for s in rep.slots
        )

    def has_work(self) -> bool:
        return self.num_running > 0 or any(r.pending for r in self._reps)

    def run_to_completion(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if not self.has_work():
                return
            self.step()

    # ----------------------------------------------------------------- step

    def step(self) -> List[Tuple[int, int]]:
        """One global SPMD step: admit + unified prefill/decode on every
        replica. Returns [(request_id, token)] emitted this step."""
        cfg, mc = self.cfg, self.cfg.model
        B, R = cfg.max_batch, self._rows

        blobs, plan_blobs, metas, wmasks = [], [], [], []
        for rep in self._reps:
            self._admit(rep)
            blob, dplan = self._plan_replica(rep)
            blobs.append(blob)
            plan_blobs.append(np.asarray(dplan.blob))
            metas.append(dplan.meta)
        assert all(m == metas[0] for m in metas[1:]), (
            "SPMD serving requires identical PlanMeta on every replica; "
            "bucket floors failed to pin the shapes"
        )

        key = self.key
        if not cfg.greedy:
            self.key, key = jax.random.split(self.key)
        keys = jax.random.key_data(jax.random.split(key, self.dp))

        toks, self.k_cache, self.v_cache = _dist_step(
            self.params, mc, cfg.page_size, self._page_bucket, R, B,
            self.k_cache, self.v_cache,
            _global_array(np.stack(blobs), self.mesh, P("dp", None)),
            _global_array(np.stack(plan_blobs), self.mesh, P("dp", None)),
            _global_array(np.asarray(keys), self.mesh, P("dp", None)),
            (
                jnp.float32(cfg.temperature),
                jnp.int32(cfg.top_k),
                jnp.float32(cfg.top_p),
            ),
            mesh=self.mesh,
            plan_meta=metas[0],
            interpret=self._interpret,
            greedy=cfg.greedy,
            kv_fp8=self._kv_fp8,
            kv_scale=self._kv_scale,
        )
        toks = np.asarray(toks)

        emitted: List[Tuple[int, int]] = []
        for r, rep in enumerate(self._reps):
            rep.new_this_step.clear()
            for slot in range(B):
                req = rep.slots[slot]
                if req is None:
                    continue
                self._emit(rep, req, int(toks[r, slot]), emitted)
        self.steps += 1
        return emitted

    # ------------------------------------------------------------ internals

    def _admit(self, rep: _Replica) -> None:
        budget = self._rows - sum(
            1 for s in rep.slots if s is not None
        )
        for slot in range(self.cfg.max_batch):
            if not rep.pending or rep.slots[slot] is not None:
                continue
            req = rep.pending[0]
            need_pages = -(-len(req.prompt) // self.cfg.page_size)
            if need_pages > rep.pool.free_pages or len(req.prompt) > budget:
                break
            seq = rep.pool.create()
            ok = rep.pool.extend(seq, len(req.prompt))
            assert ok
            req._seq, req._slot = seq, slot
            rep.slots[slot] = req
            rep.pending.pop(0)
            rep.new_this_step.add(req.request_id)
            budget -= len(req.prompt)

    def _plan_replica(self, rep: _Replica):
        """Build the unified prefill+decode plan and the per-step blob."""
        cfg, mc = self.cfg, self.cfg.model
        B, R, ps = cfg.max_batch, self._rows, cfg.page_size

        qo_lens = np.zeros(B + 1, np.int64)  # +1 dummy filler request
        kv_lens = np.zeros(B + 1, np.int64)
        tokens = np.zeros(R, np.int64)
        positions = np.zeros(R, np.int32)
        slot_idx = np.full(R, B, np.int32)  # dummy rows -> empty request
        valid = np.zeros(R, bool)
        last_rows = np.zeros(B, np.int32)

        # decode slots first extend their sequence by the token appended
        # this step (mirrors LlamaServingEngine._decode)
        row = 0
        for slot in range(B):
            req = rep.slots[slot]
            if req is None:
                continue
            new = req.request_id in rep.new_this_step
            if new:
                toks = req.prompt
                pos0 = 0
            else:
                if not rep.pool.extend(
                    req._seq, rep.pool.seq_len(req._seq) + 1
                ):
                    raise RuntimeError("KV page pool exhausted")
                toks = [req.output[-1] if req.output else req.prompt[-1]]
                pos0 = rep.pool.seq_len(req._seq) - 1
            n = len(toks)
            qo_lens[slot] = n
            kv_lens[slot] = rep.pool.seq_len(req._seq)
            tokens[row : row + n] = toks
            positions[row : row + n] = pos0 + np.arange(n)
            slot_idx[row : row + n] = slot
            valid[row : row + n] = True
            last_rows[slot] = row + n - 1
            row += n
        qo_lens[B] = R - row  # dummy request absorbs the padding rows

        # per-slot page tables (+ empty dummy)
        active = [rep.slots[s] for s in range(B) if rep.slots[s] is not None]
        if active:
            indptr_c, indices_c, last_c = rep.pool.batch_export(
                [r._seq for r in active]
            )
        else:
            indptr_c = np.zeros(1, np.int64)
            indices_c = np.zeros(0, np.int64)
            last_c = np.zeros(0, np.int64)
        kv_indptr = np.zeros(B + 2, np.int32)
        kv_last = np.zeros(B + 1, np.int32)
        counts = np.zeros(B + 1, np.int64)
        for i, req in enumerate(active):
            counts[req._slot] = indptr_c[i + 1] - indptr_c[i]
            kv_last[req._slot] = last_c[i]
        kv_indptr[1:] = np.cumsum(counts)
        kv_indices = np.zeros(self._page_bucket, np.int32)
        for i, req in enumerate(active):
            s = req._slot
            kv_indices[kv_indptr[s] : kv_indptr[s + 1]] = indices_c[
                indptr_c[i] : indptr_c[i + 1]
            ]

        qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)])
        attn = BatchAttention(kv_layout="NHD", tile_q=self._tile_q)
        attn.plan(
            qo_indptr, kv_indptr, kv_indices, kv_last,
            mc.num_qo_heads // self.tp, mc.num_kv_heads // self.tp,
            mc.head_dim, ps,
            causal=True,
            sm_scale=1.0 / float(np.sqrt(mc.head_dim)),
            kv_len_arr=kv_lens,
            kv_chunk_size=self._kv_chunk,
            work_capacity=self._work_capacity,
            min_bucket_rows=self._min_bucket_rows,
            min_max_splits=self._min_splits,
            force_kv_major=True,
        )

        slot_valid = np.asarray(
            [rep.slots[s] is not None for s in range(B)], np.int32
        )
        blob = np.concatenate([
            tokens.astype(np.int32), positions, slot_idx,
            valid.astype(np.int32), last_rows, slot_valid,
            kv_indices, kv_indptr, kv_last,
        ])
        return blob, attn.device_plan

    def _emit(self, rep, req, token, out_list) -> None:
        req.output.append(token)
        self.generated_tokens += 1
        out_list.append((req.request_id, token))
        done = len(req.output) >= req.max_new_tokens or (
            self.cfg.eos_token >= 0 and token == self.cfg.eos_token
        )
        if done:
            req.done = True
            rep.pool.release(req._seq)
            rep.slots[req._slot] = None


# ---------------------------------------------------------------------------
# jitted SPMD step
# ---------------------------------------------------------------------------


def _tp_sample(logits_local, key, sample_args, greedy, axis):
    """Sample on a vocab-sharded logits row. Greedy: segmented argmax with
    one tiny (max, idx) all_gather; sampled: gather the full row (B is
    small) and run the fused sampler."""
    v_l = logits_local.shape[1]
    t = jax.lax.axis_index(axis)
    if greedy:
        lm = jnp.max(logits_local, axis=-1)
        li = jnp.argmax(logits_local, axis=-1).astype(jnp.int32) + t * v_l
        gm = jax.lax.all_gather(lm, axis)  # [tp, B]
        gi = jax.lax.all_gather(li, axis)
        sel = jnp.argmax(gm, axis=0)
        return gi[sel, jnp.arange(gi.shape[1])].astype(jnp.int32)
    full = jax.lax.all_gather(logits_local, axis, axis=1, tiled=True)
    temperature, top_k, top_p = sample_args
    probs = softmax(full, temperature=temperature)
    return top_k_top_p_sampling_from_probs(probs, key, top_k, top_p).astype(
        jnp.int32
    )


@functools.partial(
    jax.jit,
    static_argnums=(1, 2, 3, 4, 5),
    static_argnames=("mesh", "plan_meta", "interpret", "greedy", "kv_fp8",
                     "kv_scale"),
    donate_argnums=(6, 7),
)
def _dist_step(params, mc, page_size, page_bucket, R, B, k_cache, v_cache,
               blobs, plan_blobs, keys, sample_args, *, mesh, plan_meta,
               interpret, greedy, kv_fp8=False, kv_scale=(1.0, 1.0)):
    tp = mesh.shape["tp"]
    hq_l = mc.num_qo_heads // tp
    hkv_l = mc.num_kv_heads // tp
    d = mc.head_dim

    def local(params, kc, vc, blob, plan_blob, key):
        kc, vc = kc[0], vc[0]
        blob, plan_blob = blob[0], plan_blob[0]
        key = jax.random.wrap_key_data(key[0])
        tokens = blob[:R]
        positions = blob[R : 2 * R]
        slot_idx = blob[2 * R : 3 * R]
        valid = blob[3 * R : 4 * R] != 0
        last_rows = blob[4 * R : 4 * R + B]
        kv_indices = blob[4 * R + 2 * B : 4 * R + 2 * B + page_bucket]
        kv_indptr = blob[
            4 * R + 2 * B + page_bucket : 4 * R + 3 * B + page_bucket + 2
        ]
        dplan = DevicePlan(plan_blob, meta=plan_meta)

        x = params["embedding"][tokens]
        num_pages = kc.shape[0] // mc.num_layers
        page_slot = positions // page_size
        page_ids = kv_indices[kv_indptr[slot_idx] + page_slot]
        entry_ids = positions % page_size

        # lax.scan over the stacked [L, ...] weight axis: one layer trace,
        # one layer's temporaries live at a time (serving/engine.py
        # _run_layers rationale)
        scan_params = {
            k: v for k, v in params.items()
            if k in ("wq", "wk", "wv", "wo", "w_gate_up", "w_down",
                     "attn_norm", "mlp_norm")
        }

        def body(carry, xs):
            x, kc, vc = carry
            lp, layer = xs
            xn = rmsnorm(x, lp["attn_norm"], mc.rms_eps)
            q = (xn @ lp["wq"]).reshape(R, hq_l, d)
            k = (xn @ lp["wk"]).reshape(R, hkv_l, d)
            v = (xn @ lp["wv"]).reshape(R, hkv_l, d)
            q, k = apply_rope_pos_ids(q, k, positions,
                                      rope_theta=mc.rope_theta)
            k_scale, v_scale = kv_scale
            if kv_fp8 == "int8":  # linear int8 container
                k = jnp.clip(jnp.round(k.astype(jnp.float32) / k_scale),
                             -127, 127).astype(jnp.int8)
                v = jnp.clip(jnp.round(v.astype(jnp.float32) / v_scale),
                             -127, 127).astype(jnp.int8)
            elif kv_fp8:  # fp8 KV (int8-container e4m3 bits)
                k = jax.lax.bitcast_convert_type(
                    (k.astype(jnp.float32) / k_scale).astype(
                        jnp.float8_e4m3fn), jnp.int8)
                v = jax.lax.bitcast_convert_type(
                    (v.astype(jnp.float32) / v_scale).astype(
                        jnp.float8_e4m3fn), jnp.int8)
            pids = jnp.where(
                valid, page_ids + layer * num_pages, kc.shape[0]
            )
            kc = kc.at[pids, entry_ids].set(k.astype(kc.dtype), mode="drop")
            vc = vc.at[pids, entry_ids].set(v.astype(vc.dtype), mode="drop")
            attn = run_device_plan(
                dplan, q, kc, vc, kv_layout=TensorLayout.NHD,
                k_scale=k_scale, v_scale=v_scale,
                kv_dtype=(kv_fp8 or None),
                kv_indices_offset=layer * num_pages, interpret=interpret,
            )
            attn_partial = attn.reshape(R, hq_l * d) @ lp["wo"]
            xn2, x = allreduce_rmsnorm(
                attn_partial.astype(jnp.float32), x,
                lp["mlp_norm"], mc.rms_eps, axis_name="tp",
            )
            w13 = lp["w_gate_up"]  # [h, 2, i_local]
            gate_up = jnp.einsum("bh,hti->bti", xn2, w13.astype(xn2.dtype))
            act = silu_and_mul(gate_up.reshape(R, -1))
            mlp_partial = act @ lp["w_down"]
            x = x + jax.lax.psum(
                mlp_partial.astype(jnp.float32), "tp"
            ).astype(x.dtype)
            return (x, kc, vc), None

        (x, kc, vc), _ = jax.lax.scan(
            body, (x, kc, vc),
            (scan_params, jnp.arange(mc.num_layers, dtype=jnp.int32)),
        )

        x = rmsnorm(x, params["final_norm"], mc.rms_eps)
        x_sel = x[last_rows]  # [B, hidden] — each slot's next-token state
        logits_local = (x_sel @ params["lm_head"]).astype(jnp.float32)
        toks = _tp_sample(logits_local, key, sample_args, greedy, "tp")
        # replicate tokens over dp so every PROCESS can read them locally
        # in multi-host runs (a [dp, B] int gather — trivially small)
        toks_all = jax.lax.all_gather(toks, "dp")
        return toks_all, kc[None], vc[None]

    specs = tp_param_specs(mc)
    cache_spec = P("dp", None, None, "tp", None)
    dp_spec = P("dp", None)
    step = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, cache_spec, cache_spec, dp_spec, dp_spec, dp_spec),
        out_specs=(P(None, None), cache_spec, cache_spec),
        check_vma=False,
    )
    return step(params, k_cache, v_cache, blobs, plan_blobs, keys)
