"""Continuous-batching LLM serving engine.

The reference is a kernel library whose plan/run split exists *for* engines
like vLLM/SGLang (SURVEY.md §0); this module is the engine side, built
entirely on this framework's own components so the system is usable (and
benchmarkable, BASELINE.md tokens/sec north star) end to end:

  * native page pool (csrc/page_pool.cc)       — KV block allocation
  * native planner (csrc/planner.cc)           — per-step work descriptors
  * DevicePlan pytree (ops/attention/batch.py) — retrace-free jitted steps
  * paged attention Pallas kernel + append op  — the device hot path
  * sampling ops                               — token selection

Jit strategy (the TPU analogue of the reference's CUDA-graph capture,
decode.py:1413 CUDAGraphBatchDecodeWithPagedKVCacheWrapper): the decode step
is compiled ONCE per (max_batch, bucket) because every dynamic value —
tokens, positions, page tables, plan arrays — is a jit *argument* and every
shape is a pure function of the plan's power-of-2 buckets. Host work per
step is one native plan() + array uploads. KV caches are donated, so
appends are in-place.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.models.llama import LlamaConfig, llama_init_weights
from flashinfer_tpu.ops.activation import silu_and_mul
from flashinfer_tpu.ops.attention.batch import (
    BatchDecodeWithPagedKVCacheWrapper,
    BatchPrefillWithPagedKVCacheWrapper,
    run_device_plan,
)
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.ops.rope import apply_rope_pos_ids
from flashinfer_tpu.ops.sampling import top_k_top_p_sampling_from_probs, softmax
from flashinfer_tpu.scheduler.native import PagePool
from flashinfer_tpu.utils import TensorLayout, next_power_of_2, on_tpu

__all__ = ["EngineConfig", "GenerationRequest", "LlamaServingEngine",
           "calibrate_kv_scales", "fuse_qkv_weights", "propose_ngram"]


@dataclasses.dataclass
class EngineConfig:
    model: LlamaConfig
    max_batch: int = 8
    num_pages: int = 1024
    page_size: int = 16
    max_seq_len: int = 2048
    top_k: int = 40
    top_p: float = 0.9
    temperature: float = 1.0
    greedy: bool = False
    eos_token: int = -1  # -1 = never stop on eos
    interpret: Optional[bool] = None  # Pallas interpret (None = auto)
    # KV-cache quantization (BASELINE.md north star: FP8 paged decode).
    # "bf16"/"model" = model dtype; "fp8_e4m3" / "int8" halve KV HBM
    # footprint ("int8" = linear container, one-convert dequant) —
    # the attention kernel dequantizes in-register (ops/fp8.py bit decode).
    kv_dtype: str = "model"
    # per-tensor quant scale(s): one float for both K and V, or a
    # (k_scale, v_scale) pair. Use calibrate_kv_scales() to compute
    # amax/448 scales from sample prompts (the reference threads calibrated
    # k_scale/v_scale through every fp8 attention API — decode.py run args)
    kv_scale: object = 0.05
    # "fp8_e4m3" stores matmul weights as e4m3 bits + per-output-channel
    # scales (halves weight HBM; 8B fits one 16 GB chip). Dequant fuses
    # into the MXU operand reads at serving batch sizes (docs/PERF.md).
    # "int8" is the TPU-native 8-bit container (same footprint, LINEAR
    # per-channel quant): int8 -> bf16 is one hardware convert vs the
    # e4m3 bit decode's 9 int ops / 4 elems on the VPU, so the weight-
    # read-bound decode step runs at the bf16 byte rate.
    weight_dtype: str = "model"
    # Speculative decoding (reference: fast_decode_plan decode.py:2416 +
    # XQA qo>1 verification + chain_speculative_sampling). spec_tokens=G>0
    # proposes G draft tokens per step via prompt-lookup (n-gram match in
    # the sequence's own context — no draft model needed) and verifies all
    # G+1 positions in ONE qo>1 batch run; accepted drafts emit together,
    # so a step can produce up to G+1 tokens.
    spec_tokens: int = 0
    spec_ngram: int = 3  # longest suffix n-gram the proposer matches
    # Page-cache layout. "NHD" [pages, ps, kvh, d] keeps the append scatter
    # contiguous; "HND" [pages, kvh, ps, d] lets the attention kernel slice
    # / fori_loop the head axis (head-group DMAs + the head-loop prefill
    # body — the prefill-MFU path), at the cost of a strided append
    # scatter. Token-exact either way (test_serving_engine); pick by
    # measurement on the target hardware.
    kv_layout: str = "NHD"
    # Multi-step decode window (the TPU analogue of multi-step scheduling /
    # CUDA-graph decode-loop replay): plan N consecutive decode steps on
    # the host up-front (decode lengths are deterministic — +1 token per
    # active sequence per step), stack the N plan blobs, and run ONE jitted
    # lax.scan over the steps with on-device token feedback. Host planning
    # + dispatch (multi-ms through a tunneled chip; ~1 ms attached) is paid
    # once per window instead of once per token. Tokens past a request's
    # eos are computed then discarded on the host (KV rolled back via the
    # native truncate — the spec-decode rollback path), exactly the
    # overrun-and-discard contract of multi-step schedulers. 1 = off.
    decode_window: int = 1


@dataclasses.dataclass
class GenerationRequest:
    prompt: List[int]
    max_new_tokens: int
    # filled by the engine
    request_id: int = -1
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    _seq: int = -1
    _slot: int = -1


class LlamaServingEngine:
    """Single-chip continuous-batching engine for the Llama family."""

    def __init__(
        self,
        config: EngineConfig,
        params: Optional[Dict[str, jax.Array]] = None,
        seed: int = 0,
    ):
        self.cfg = config
        mc = config.model
        if config.kv_dtype not in ("model", "bf16", "fp8_e4m3", "int8"):
            raise ValueError(f"unknown kv_dtype {config.kv_dtype!r}")
        if config.weight_dtype not in ("model", "fp8_e4m3", "int8"):
            raise ValueError(f"unknown weight_dtype {config.weight_dtype!r}")
        if config.kv_layout not in ("NHD", "HND"):
            raise ValueError(f"unknown kv_layout {config.kv_layout!r}")
        if config.page_size < 8:
            # tiny pages are the vector-sparse wrapper's regime: its plan
            # rides a synthetic repacked page table that the engine's
            # direct run_device_plan path does not apply, so the plan and
            # the raw cache would disagree (silently wrong attention)
            raise ValueError(
                f"engine page_size must be >= 8, got {config.page_size}")
        self.params = params or llama_init_weights(jax.random.key(seed), mc)
        if config.weight_dtype == "fp8_e4m3":
            if "wo_iscale" in self.params:
                raise ValueError(
                    "weight_dtype='fp8_e4m3' but params hold linear-int8 "
                    "containers (_iscale keys present)")
            if self.params["wo"].dtype != jnp.int8:
                from flashinfer_tpu.models.llama import (
                    quantize_llama_weights_fp8)

                self.params = quantize_llama_weights_fp8(self.params)
        elif config.weight_dtype == "int8" and "wo_iscale" not in self.params:
            if self.params["wo"].dtype == jnp.int8:
                raise ValueError(
                    "weight_dtype='int8' but params hold e4m3 bits "
                    "(int8 dtype without _iscale keys)")
            from flashinfer_tpu.models.llama import quantize_llama_weights_int8

            self.params = quantize_llama_weights_int8(self.params)
        self.params = fuse_qkv_weights(self.params)
        self.pool = PagePool(config.num_pages, config.page_size)
        self.key = jax.random.key(seed + 1)

        # all layers share ONE page id space: e.g. NHD [L*pages, ps, kvh, d]
        # with layer l's copy of page p at row l*num_pages + p. The jitted
        # step then never slices the (donated) cache per layer — slicing
        # would force XLA to materialize per-layer copies.
        if config.kv_layout == "HND":
            shape = (
                mc.num_layers * config.num_pages,
                mc.num_kv_heads,
                config.page_size,
                mc.head_dim,
            )
        else:
            shape = (
                mc.num_layers * config.num_pages,
                config.page_size,
                mc.num_kv_heads,
                mc.head_dim,
            )
        # explicit 8-bit-mode discriminator — NEVER inferred from kv_scale's
        # value (kv_dtype="fp8_e4m3" with kv_scale=1.0 is a legal config).
        # False = full-width; "e4m3" = fp8 bit containers; "int8" = LINEAR
        # int8 (value = q*scale; ONE hardware convert per read vs the e4m3
        # bit decode — the TPU-native 8-bit KV container, pre-v6 TPUs have
        # no fp8 hardware)
        self._kv_fp8 = {"fp8_e4m3": "e4m3", "int8": "int8"}.get(
            config.kv_dtype, False)
        if self._kv_fp8:
            # both 8-bit modes live in an int8 container: a float8-dtype
            # cache would cost a full bitcast copy per layer per step inside
            # the jitted run (ops/attention/batch.py run_device_plan note),
            # and pre-v6 TPUs stream int8 at full rate but float8 ~8x slower
            cache_dtype = jnp.int8
            self._kv_scale = _norm_kv_scale(config.kv_scale)
            if not (config.interpret if config.interpret is not None
                    else not on_tpu()) and config.page_size < 32:
                raise ValueError(
                    "8-bit KV on real TPUs needs page_size >= 32 (int8 "
                    f"VMEM sublane tile is 32), got {config.page_size}"
                )
        else:
            cache_dtype = mc.dtype
            self._kv_scale = (1.0, 1.0)
        self.k_cache = jnp.zeros(shape, cache_dtype)
        self.v_cache = jnp.zeros(shape, cache_dtype)

        self._slots: List[Optional[GenerationRequest]] = [None] * config.max_batch
        self._pending: List[GenerationRequest] = []
        self._next_id = 0
        self._decode_wrapper = BatchDecodeWithPagedKVCacheWrapper(
            kv_layout=config.kv_layout, backend="pallas"
        )
        self._prefill_wrapper = BatchPrefillWithPagedKVCacheWrapper(
            kv_layout=config.kv_layout, backend="pallas", tile_q=256,
            # NHD caches can't head-slice, so per-head VMEM state scales
            # with tile_q; 256 keeps large-model prefill inside Mosaic's
            # scoped-vmem limit with ~the same MXU efficiency. (HND caches
            # route to the head-loop body, where 256 is also legal.)
        )
        self._interpret = (
            config.interpret if config.interpret is not None else not on_tpu()
        )
        self._page_bucket = next_power_of_2(config.num_pages)
        if config.spec_tokens > 0:
            # verify wrapper: qo_len = G+1 rows per slot through the same
            # unified kernel (tile_q auto-sizes to the packed draft rows)
            self._spec_wrapper = BatchPrefillWithPagedKVCacheWrapper(
                kv_layout=config.kv_layout, backend="pallas"
            )
        self.steps = 0
        self.generated_tokens = 0
        self.preemptions = 0

    # ------------------------------------------------------------------ API

    def add_request(self, prompt, max_new_tokens: int) -> GenerationRequest:
        total = len(prompt) + max_new_tokens
        if total > self.cfg.max_seq_len:
            # fail fast: a sequence growing past max_seq_len would overflow
            # the fixed decode work capacity mid-serve
            raise ValueError(
                f"prompt_len + max_new_tokens = {total} exceeds "
                f"max_seq_len={self.cfg.max_seq_len}"
            )
        req = GenerationRequest(list(map(int, prompt)), max_new_tokens)
        req.request_id = self._next_id
        self._next_id += 1
        self._pending.append(req)
        return req

    @property
    def num_running(self) -> int:
        return sum(s is not None for s in self._slots)

    def has_work(self) -> bool:
        return self.num_running > 0 or bool(self._pending)

    def run_to_completion(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if not self.has_work():
                return
            self.step()

    def score(self, prompt) -> np.ndarray:
        """Teacher-forced per-position next-token logits for one prompt
        ([len(prompt), vocab] f32; row i predicts token i+1).

        The prompt-logprobs / perplexity-eval surface serving engines
        expose, and the accuracy gate for quantized configs (BASELINE.md
        accuracy row): score the same prompt under bf16 / fp8-KV /
        fp8-weight engines and compare distributions (tests/
        test_accuracy.py). Uses scratch pages from the engine's pool;
        running requests are untouched."""
        mc = self.cfg.model
        P = len(prompt)
        seq = self.pool.create()
        if not self.pool.extend(seq, P):
            self.pool.release(seq)
            raise RuntimeError("KV page pool exhausted")
        try:
            indptr, indices, last = self.pool.batch_export([seq])
            padded_idx = np.zeros(self._page_bucket, np.int32)
            padded_idx[: len(indices)] = indices
            bucket = next_power_of_2(max(P, 8))
            qo_indptr = np.asarray([0, P, bucket], np.int64)
            plan_indptr = np.concatenate([indptr, [indptr[-1]]]).astype(
                np.int32)
            plan_last = np.concatenate([last, [0]]).astype(np.int32)
            self._prefill_wrapper.plan(
                qo_indptr, plan_indptr, padded_idx, plan_last,
                mc.num_qo_heads, mc.num_kv_heads, mc.head_dim,
                self.cfg.page_size, causal=True,
                kv_chunk_size=self._kv_chunk(),
            )
            tokens = np.zeros(bucket, np.int64)
            tokens[:P] = prompt
            positions = np.zeros(bucket, np.int32)
            positions[:P] = np.arange(P)
            batch_idx = np.zeros(bucket, np.int32)
            valid = np.zeros(bucket, bool)
            valid[:P] = True
            logits, self.k_cache, self.v_cache = _score_step(
                self.params, mc, self.cfg.page_size,
                self.k_cache, self.v_cache,
                jnp.asarray(tokens), jnp.asarray(positions),
                jnp.asarray(batch_idx), jnp.asarray(valid),
                jnp.asarray(padded_idx), jnp.asarray(plan_indptr),
                self._prefill_wrapper.device_plan,
                interpret=self._interpret,
                kv_fp8=self._kv_fp8, kv_scale=self._kv_scale,
                kv_layout=self.cfg.kv_layout,
            )
            return np.asarray(logits[:P])
        finally:
            self.pool.release(seq)

    # ----------------------------------------------------------------- step

    def step(self) -> List[Tuple[int, int]]:
        """Admit pending requests (prefill) then decode one token for every
        running sequence. Returns [(request_id, token)] emitted this step."""
        emitted: List[Tuple[int, int]] = []
        self._admit(emitted)
        if self.num_running:
            if self.cfg.spec_tokens > 0:
                emitted.extend(self._spec_decode())
            elif self.cfg.decode_window > 1:
                emitted.extend(self._decode_window())
            else:
                emitted.extend(self._decode())
        self.steps += 1
        return emitted

    # ------------------------------------------------------------ admission

    def _admit(self, emitted: List[Tuple[int, int]]) -> None:
        """Move pending requests into free slots; prefill them as one batch.

        A request resuming after preemption re-prefills its FULL context
        (prompt + generated output) — the vLLM/SGLang "recompute" policy —
        so its KV state is identical to never having been evicted."""
        admitted: List[GenerationRequest] = []
        for slot in range(self.cfg.max_batch):
            if not self._pending or self._slots[slot] is not None:
                continue
            req = self._pending[0]
            ctx_len = len(req.prompt) + len(req.output)
            need_pages = -(-ctx_len // self.cfg.page_size)
            if need_pages > self.pool.num_pages:
                raise ValueError(
                    f"request {req.request_id} needs {need_pages} pages but "
                    f"the pool only has {self.pool.num_pages} — it can never "
                    "be admitted")
            if need_pages > self.pool.free_pages:
                break
            seq = self.pool.create()
            ok = self.pool.extend(seq, ctx_len)
            assert ok
            req._seq, req._slot = seq, slot
            self._slots[slot] = req
            self._pending.pop(0)
            admitted.append(req)
        if admitted:
            self._prefill(admitted, emitted)

    def _preempt_youngest(self) -> Optional[GenerationRequest]:
        """Evict the youngest running request (highest request_id = lowest
        continuous-batching priority): free its KV pages and put it at the
        FRONT of the pending queue. Re-admission re-prefills prompt+output,
        so greedy output is token-exact across the eviction. Returns the
        victim, or None if nothing is running."""
        cands = [r for r in self._slots if r is not None]
        if not cands:
            return None
        victim = max(cands, key=lambda r: r.request_id)
        self.pool.release(victim._seq)
        self._slots[victim._slot] = None
        victim._seq = victim._slot = -1
        self._pending.insert(0, victim)
        self.preemptions += 1
        return victim

    def _reserve(
        self, reqs: List[GenerationRequest], extra: int
    ) -> List[GenerationRequest]:
        """Reserve KV room (+extra tokens each) for this decode step,
        evicting-and-requeueing the youngest sequence on pool exhaustion
        instead of dying (reference serving contract: vLLM/SGLang preempt
        on KV pressure). Returns the surviving request list."""
        live = list(reqs)
        i = 0
        while i < len(live):
            r = live[i]
            if self.pool.extend(r._seq, self.pool.seq_len(r._seq) + extra):
                i += 1
                continue
            if self.num_running == 1:
                # evicting r frees the whole pool and it STILL won't fit:
                # the single sequence exceeds the pool — a config error,
                # not scheduling pressure
                raise RuntimeError(
                    "KV page pool exhausted: one sequence alone exceeds "
                    f"the pool ({self.pool.num_pages} pages)")
            victim = self._preempt_youngest()
            assert victim is not None
            if victim is r:
                live.pop(i)  # don't advance i
            elif victim in live:
                vi = live.index(victim)
                live.pop(vi)
                if vi < i:
                    i -= 1
        return live

    def _batch_tables(self, reqs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        indptr, indices, last = self.pool.batch_export([r._seq for r in reqs])
        padded = np.zeros(self._page_bucket, np.int32)
        padded[: len(indices)] = indices
        return indptr, padded, last

    def _prefill(self, reqs: List[GenerationRequest], emitted) -> None:
        mc = self.cfg.model
        # full context: fresh requests have empty output; requests resuming
        # after preemption re-prefill prompt + generated-so-far (the sampled
        # next token continues generation exactly where eviction cut it off)
        prompts = [r.prompt + r.output for r in reqs]
        lens = np.asarray([len(p) for p in prompts])
        nnz = int(lens.sum())
        bucket = next_power_of_2(max(nnz, 8))
        # pad with a dummy request (kv_len=0 -> planner drops it; its rows
        # produce zero logits which we never read)
        pad = bucket - nnz
        qo_indptr = np.concatenate([[0], np.cumsum(lens), [bucket]])
        indptr, indices, last = self._batch_tables(reqs)
        indptr = np.concatenate([indptr, [indptr[-1]]])  # dummy: no pages
        last = np.concatenate([last, [0]])

        self._prefill_wrapper.plan(
            qo_indptr, indptr, indices, last,
            mc.num_qo_heads, mc.num_kv_heads, mc.head_dim, self.cfg.page_size,
            causal=True, kv_chunk_size=self._kv_chunk(),
        )
        tokens = np.zeros(bucket, np.int64)
        tokens[:nnz] = np.concatenate(prompts)
        positions = np.zeros(bucket, np.int32)
        batch_idx = np.zeros(bucket, np.int32)
        off = 0
        for i, p in enumerate(prompts):
            positions[off : off + len(p)] = np.arange(len(p))
            batch_idx[off : off + len(p)] = i
            off += len(p)
        valid = np.zeros(bucket, bool)
        valid[:nnz] = True
        # rows holding each request's LAST prompt token (for next-token logits)
        last_rows = np.cumsum(lens) - 1

        sub = self._next_key()
        toks, self.k_cache, self.v_cache = _prefill_step(
            self.params, mc, self.cfg.page_size,
            self.k_cache, self.v_cache,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(batch_idx),
            jnp.asarray(valid),
            jnp.asarray(indices), jnp.asarray(indptr.astype(np.int32)),
            jnp.asarray(last.astype(np.int32)),
            self._prefill_wrapper.device_plan,
            jnp.asarray(last_rows.astype(np.int32)),
            sub, self._sample_args(),
            interpret=self._interpret, greedy=self.cfg.greedy,
            kv_fp8=self._kv_fp8, kv_scale=self._kv_scale,
                kv_layout=self.cfg.kv_layout,
        )
        toks = np.asarray(toks)
        for r, t in zip(reqs, toks):
            self._emit(r, int(t), emitted)

    # --------------------------------------------------------------- decode

    def _kv_chunk(self) -> int:
        # smaller chunks keep kernel tiles sized to REAL kv (the fp8 decode
        # and softmax always process the whole resident tile, so a 1024-wide
        # tile over a 200-token sequence wastes 5x VPU work); split-KV
        # merge overhead at 512 is ~3%
        return min(512, next_power_of_2(self.cfg.max_seq_len))

    def _slot_tables(self, reqs):
        """Expand the compact batch export into fixed B-slot CSR tables
        (inactive slots: kv_len 0, empty page range)."""
        B = self.cfg.max_batch
        indptr, indices, last = self._batch_tables(reqs)
        full_indptr = np.zeros(B + 1, np.int32)
        full_last = np.zeros(B, np.int32)
        kv_lens = np.zeros(B, np.int64)
        counts = np.zeros(B, np.int64)
        for i, r in enumerate(reqs):
            s = r._slot
            kv_lens[s] = self.pool.seq_len(r._seq)
            full_last[s] = last[i]
            counts[s] = indptr[i + 1] - indptr[i]
        full_indptr[1:] = np.cumsum(counts)
        slot_indices = np.zeros(self._page_bucket, np.int32)
        for i, r in enumerate(reqs):
            s = r._slot
            slot_indices[full_indptr[s] : full_indptr[s + 1]] = indices[
                indptr[i] : indptr[i + 1]
            ]
        return full_indptr, slot_indices, full_last, kv_lens

    def _decode(self) -> List[Tuple[int, int]]:
        mc, B = self.cfg.model, self.cfg.max_batch
        reqs = [r for r in self._slots if r is not None]
        # room for the token being appended this step (preempts on pressure)
        reqs = self._reserve(reqs, 1)
        if not reqs:
            return []

        full_indptr, slot_indices, full_last, kv_lens = self._slot_tables(reqs)
        tokens = np.zeros(B, np.int64)
        positions = np.zeros(B, np.int32)
        valid = np.zeros(B, bool)
        for r in reqs:
            s = r._slot
            cur = r.output[-1] if r.output else r.prompt[-1]
            tokens[s] = cur
            positions[s] = kv_lens[s] - 1
            valid[s] = True

        self._decode_wrapper.plan(
            full_indptr, slot_indices, full_last,
            mc.num_qo_heads, mc.num_kv_heads, mc.head_dim, self.cfg.page_size,
            kv_len_arr=kv_lens, kv_chunk_size=self._kv_chunk(),
            work_capacity=self._decode_capacity(kv_lens),
        )
        # one consolidated H2D upload for all per-step host arrays
        # (per-array device_put latency dominates on tunneled devices)
        blob = np.concatenate([
            tokens.astype(np.int32), positions.astype(np.int32),
            valid.astype(np.int32), slot_indices.astype(np.int32),
            full_indptr.astype(np.int32), full_last.astype(np.int32),
        ])
        sub = self._next_key()
        toks, self.k_cache, self.v_cache = _decode_step(
            self.params, mc, self.cfg.page_size, self._page_bucket,
            self.k_cache, self.v_cache, jnp.asarray(blob),
            self._decode_wrapper.device_plan, sub, self._sample_args(),
            interpret=self._interpret, greedy=self.cfg.greedy,
            kv_fp8=self._kv_fp8, kv_scale=self._kv_scale,
                kv_layout=self.cfg.kv_layout,
        )
        toks = np.asarray(toks)
        out: List[Tuple[int, int]] = []
        for r in reqs:
            self._emit(r, int(toks[r._slot]), out)
        return out

    def _decode_window(self) -> List[Tuple[int, int]]:
        """N decode steps in ONE jitted lax.scan (EngineConfig.decode_window).

        Decode lengths are deterministic (+1 token per active sequence per
        step), so all N plans are computed here up-front, their blobs stacked
        into a single upload, and the device feeds each step's sampled tokens
        into the next (token feedback stays on device). The N plans share one
        PlanMeta — work capacity and the split bucket are pinned to the
        window-END lengths — so the jit compiles once. Post-eos overrun
        tokens are discarded and their KV rolled back (pool.truncate, the
        spec-decode rollback path)."""
        mc, B = self.cfg.model, self.cfg.max_batch
        reqs = [r for r in self._slots if r is not None]
        window = min(
            self.cfg.decode_window,
            min(r.max_new_tokens - len(r.output) for r in reqs),
        )
        if window <= 1:
            return self._decode()
        reqs = self._reserve(reqs, window)
        if not reqs:
            return []

        full_indptr, slot_indices, full_last, kv_end = self._slot_tables(reqs)
        active = kv_end > 0
        base = np.where(active, kv_end - window, 0)
        chunk = self._kv_chunk()
        cap = self._decode_capacity(kv_end)
        min_splits = int(next_power_of_2(
            max(1, int(np.max(-(-kv_end // chunk), initial=1)))))

        tokens = np.zeros(B, np.int64)
        valid = np.zeros(B, bool)
        for r in reqs:
            s = r._slot
            tokens[s] = r.output[-1] if r.output else r.prompt[-1]
            valid[s] = True

        plan_blobs, metas, step_blobs = [], [], []
        for i in range(window):
            kv_i = np.where(active, base + i + 1, 0)
            self._decode_wrapper.plan(
                full_indptr, slot_indices, full_last,
                mc.num_qo_heads, mc.num_kv_heads, mc.head_dim,
                self.cfg.page_size,
                kv_len_arr=kv_i, kv_chunk_size=chunk,
                work_capacity=cap, min_max_splits=min_splits,
                defer_upload=True,
            )
            dp = self._decode_wrapper.device_plan
            metas.append(dp.meta)
            plan_blobs.append(dp.blob)
            positions = np.where(active, base + i, 0).astype(np.int32)
            step_blobs.append(np.concatenate([
                tokens.astype(np.int32), positions,
                valid.astype(np.int32), slot_indices.astype(np.int32),
                full_indptr.astype(np.int32), full_last.astype(np.int32),
            ]))
        assert all(m == metas[0] for m in metas[1:]), (
            "window plans must share one PlanMeta (jit key)"
        )
        sub = self._next_key()
        keys = jax.random.split(sub, window)
        toks, self.k_cache, self.v_cache = _decode_window_step(
            self.params, mc, self.cfg.page_size, self._page_bucket,
            self.k_cache, self.v_cache,
            jnp.asarray(np.stack(step_blobs)),
            jnp.asarray(np.stack(plan_blobs)),
            keys, self._sample_args(), plan_meta=metas[0],
            interpret=self._interpret, greedy=self.cfg.greedy,
            kv_fp8=self._kv_fp8, kv_scale=self._kv_scale,
            kv_layout=self.cfg.kv_layout,
        )
        toks = np.asarray(toks)  # [window, B]
        out: List[Tuple[int, int]] = []
        for r in reqs:
            s, seq, b = r._slot, r._seq, int(base[r._slot])
            accepted: List[int] = []
            for i in range(window):
                t = int(toks[i, s])
                accepted.append(t)
                if self.cfg.eos_token >= 0 and t == self.cfg.eos_token:
                    break
            if len(accepted) < window:
                # roll back the overrun feed tokens' KV: valid state = base
                # + accepted count (the last accepted token's KV lands on
                # the NEXT step — the decode invariant)
                self.pool.truncate(seq, b + len(accepted))
            for t in accepted:
                self._emit(r, t, out)
        return out

    def _spec_decode(self) -> List[Tuple[int, int]]:
        """Speculative decode step: propose G draft tokens per sequence
        (prompt-lookup), verify all G+1 positions in one qo>1 batch run,
        emit the accepted prefix + one bonus token, roll the KV tail back.

        Reference decomposition: fast_decode_plan (decode.py:2416, the
        qo>1 re-plan), XQA spec-decode kernels, and
        chain_speculative_sampling (sampling.py)."""
        mc, B = self.cfg.model, self.cfg.max_batch
        G = self.cfg.spec_tokens
        reqs = [r for r in self._slots if r is not None]
        reqs = self._reserve(reqs, G + 1)
        if not reqs:
            return []
        kv0 = np.zeros(B, np.int64)
        drafts = np.zeros((B, G), np.int64)
        for r in reqs:
            s = r._slot
            kv0[s] = self.pool.seq_len(r._seq) - (G + 1)  # pre-reserve length
            ctx = r.prompt + r.output
            drafts[s] = propose_ngram(ctx, G, self.cfg.spec_ngram)

        full_indptr, slot_indices, full_last, kv_lens = self._slot_tables(reqs)
        rows = G + 1
        nnz = B * rows
        bucket = next_power_of_2(max(nnz, 8))
        tokens = np.zeros(bucket, np.int64)
        positions = np.zeros(bucket, np.int32)
        batch_idx = np.zeros(bucket, np.int32)
        valid = np.zeros(bucket, bool)
        for r in reqs:
            s = r._slot
            cur = r.output[-1] if r.output else r.prompt[-1]
            o = s * rows
            tokens[o] = cur
            tokens[o + 1 : o + rows] = drafts[s]
            positions[o : o + rows] = kv0[s] + np.arange(rows)
            batch_idx[o : o + rows] = s
            valid[o : o + rows] = True

        # plan: every slot contributes G+1 query rows (empty slots have
        # kv_len 0 and their work items drop); a trailing dummy request
        # absorbs the pad rows
        qo_indptr = np.concatenate(
            [np.arange(B + 1, dtype=np.int64) * rows, [bucket]]
        )
        plan_indptr = np.concatenate([full_indptr, [full_indptr[-1]]])
        plan_last = np.concatenate([full_last, [0]])
        self._spec_wrapper.plan(
            qo_indptr, plan_indptr, slot_indices, plan_last,
            mc.num_qo_heads, mc.num_kv_heads, mc.head_dim, self.cfg.page_size,
            causal=True, kv_chunk_size=self._kv_chunk(),
            kv_len_arr=np.concatenate([kv_lens, [0]]),
            work_capacity=self._work_capacity(),
        )
        blob = np.concatenate([
            tokens.astype(np.int32), positions.astype(np.int32),
            batch_idx.astype(np.int32), valid.astype(np.int32),
            drafts.reshape(-1).astype(np.int32),
            slot_indices.astype(np.int32),
            plan_indptr.astype(np.int32), plan_last.astype(np.int32),
        ])
        sub = self._next_key()
        emitted_toks, self.k_cache, self.v_cache = _spec_verify_step(
            self.params, mc, self.cfg.page_size, self._page_bucket, bucket, B,
            G, self.k_cache, self.v_cache, jnp.asarray(blob),
            self._spec_wrapper.device_plan, sub, self._sample_args(),
            interpret=self._interpret, greedy=self.cfg.greedy,
            kv_fp8=self._kv_fp8, kv_scale=self._kv_scale,
                kv_layout=self.cfg.kv_layout,
        )
        emitted_toks = np.asarray(emitted_toks)  # [B, G+1], -1 after reject
        out: List[Tuple[int, int]] = []
        for r in reqs:
            s = r._slot
            row = emitted_toks[s]
            toks: List[int] = []
            for t in row:
                if t < 0:
                    break
                toks.append(int(t))
                if self.cfg.eos_token >= 0 and t == self.cfg.eos_token:
                    break
            toks = toks[: r.max_new_tokens - len(r.output)]
            # valid KV = current token + accepted drafts; the bonus token's
            # KV is appended by the NEXT step (decode invariant)
            self.pool.truncate(r._seq, int(kv0[s]) + len(toks))
            for t in toks:
                self._emit(r, t, out)
        return out

    def _work_capacity(self) -> int:
        """Worst-case work-item capacity: B qo-tiles × max kv chunks per
        seq. Used by the spec-verify step (whose causal qo>1 item count is
        plan-dependent) and as the ceiling for _decode_capacity."""
        chunks = -(-self.cfg.max_seq_len // self._kv_chunk())
        return next_power_of_2(max(8, self.cfg.max_batch * chunks))

    def _decode_capacity(self, kv_lens) -> int:
        """Power-of-2 work-item bucket sized to THIS step's real work.

        Decode plans have exactly ceil(kv_len / kv_chunk) items per active
        sequence (one qo tile, no causal pruning), so the needed count is
        exact. Every padded item still costs a kernel grid step PER LAYER
        (~1-2 us of Mosaic step overhead each): at short contexts a
        max-capacity plan (e.g. 64 items when 16 are real) wastes
        ~48 steps x num_layers per decode step. Buckets are powers of two,
        so the jit compiles once per bucket (<= log2 of the span; the same
        cadence at which PlanMeta.max_splits already changes as kv grows)."""
        chunk = self._kv_chunk()
        needed = int(sum(-(-int(l) // chunk) for l in kv_lens if l > 0))
        return min(self._work_capacity(), next_power_of_2(max(8, needed)))

    # -------------------------------------------------------------- helpers

    def _next_key(self):
        # greedy never consumes randomness; skip the per-step device split
        if self.cfg.greedy:
            return self.key
        self.key, sub = jax.random.split(self.key)
        return sub

    def _sample_args(self):
        # cached: eager scalar converts cost a device round trip each
        if not hasattr(self, "_sample_args_cached"):
            self._sample_args_cached = (
                jnp.float32(self.cfg.temperature),
                jnp.int32(self.cfg.top_k),
                jnp.float32(self.cfg.top_p),
            )
        return self._sample_args_cached

    def _emit(self, req: GenerationRequest, token: int, out_list) -> None:
        req.output.append(token)
        self.generated_tokens += 1
        out_list.append((req.request_id, token))
        if (
            len(req.output) >= req.max_new_tokens
            or token == self.cfg.eos_token
        ):
            req.done = True
            self.pool.release(req._seq)
            self._slots[req._slot] = None


def _norm_kv_scale(s) -> Tuple[float, float]:
    """EngineConfig.kv_scale -> static (k_scale, v_scale) floats."""
    if isinstance(s, (tuple, list)):
        ks, vs = s
        return float(ks), float(vs)
    return float(s), float(s)


def calibrate_kv_scales(
    config: EngineConfig,
    prompts: List[List[int]],
    params: Optional[Dict[str, jax.Array]] = None,
    *,
    seed: int = 0,
    headroom: float = 1.0,
) -> Tuple[float, float]:
    """Per-tensor 8-bit KV scales from sample activations (amax/448 for
    e4m3; amax/127 when ``config.kv_dtype == "int8"``).

    Runs one bf16 prefill over the calibration prompts and reads the
    roped K / V amax straight from the paged caches — exactly the values a
    quantized cache would store. Pass the result as
    ``EngineConfig(kv_scale=calibrate_kv_scales(...), kv_dtype="fp8_e4m3")``
    (or ``kv_dtype="int8"`` for the linear container).
    Reference parity: calibrated k_scale/v_scale threaded through the fp8
    attention APIs (flashinfer/decode.py run k_scale/v_scale args); the
    reference leaves producing them to the serving stack, which computes
    amax over calibration batches the same way.
    """
    import dataclasses as _dc

    cal = _dc.replace(config, kv_dtype="model", spec_tokens=0, greedy=True,
                      max_batch=max(config.max_batch, len(prompts)))
    eng = LlamaServingEngine(cal, params=params, seed=seed)
    for p in prompts:
        eng.add_request(list(p), 1)
    while eng.has_work():
        eng.step()
    qmax = 127.0 if config.kv_dtype == "int8" else 448.0
    amax_k = float(jnp.max(jnp.abs(eng.k_cache.astype(jnp.float32))))
    amax_v = float(jnp.max(jnp.abs(eng.v_cache.astype(jnp.float32))))
    return (max(amax_k, 1e-6) * headroom / qmax,
            max(amax_v, 1e-6) * headroom / qmax)


def propose_ngram(ctx: List[int], num_spec: int, max_ngram: int) -> List[int]:
    """Prompt-lookup draft proposer: find the most recent earlier occurrence
    of the longest suffix n-gram (n = max_ngram..1) and propose the tokens
    that followed it. Fallback: repeat the last token (cheap; verification
    simply rejects). This is the draft-model-free proposer popularized as
    prompt-lookup / n-gram speculative decoding; the reference ships the
    verification side (chain_speculative_sampling) and leaves proposing to
    engines."""
    L = len(ctx)
    arr = np.asarray(ctx)
    for n in range(min(max_ngram, L - 1), 0, -1):
        pat = arr[L - n :]
        # vectorized scan for the latest match strictly before the suffix
        windows = np.lib.stride_tricks.sliding_window_view(arr[: L - 1], n)
        hits = np.nonzero((windows == pat).all(axis=1))[0]
        if hits.size:
            i = int(hits[-1])
            cont = ctx[i + n : i + n + num_spec]
            if cont:
                out = list(cont)
                while len(out) < num_spec:
                    out.append(out[-1])
                return out
    return [ctx[-1]] * num_spec


# ---------------------------------------------------------------------------
# jitted device steps (module-level so the compile cache is shared)

# weights with a leading [num_layers, ...] axis — the lax.scan xs
_PER_LAYER = ("wqkv", "wq", "wk", "wv", "wo", "w_gate_up", "w_down",
              "attn_norm", "mlp_norm")


def _is_per_layer(name: str) -> bool:
    base = name
    for suf in ("_iscale", "_scale"):
        if base.endswith(suf):
            base = base[: -len(suf)]
            break
    return base in _PER_LAYER


def fuse_qkv_weights(params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Concatenate wq/wk/wv (and their fp8 scales) into one wqkv so the
    decode step runs ONE [rows, h] x [h, (hq+2*hkv)*d] GEMM per layer —
    at serving batch sizes all three projections are weight-read-bound and
    three small-N GEMMs waste MXU ramp-up on each."""
    if "wqkv" in params or "wq" not in params:
        return params
    p = dict(params)
    p["wqkv"] = jnp.concatenate(
        [p.pop("wq"), p.pop("wk"), p.pop("wv")], axis=-1)
    for suf in ("_scale", "_iscale"):
        if "wq" + suf in p:
            p["wqkv" + suf] = jnp.concatenate(
                [p.pop("wq" + suf), p.pop("wk" + suf), p.pop("wv" + suf)],
                axis=-1)
    return p


def _wmm(x, params, name):
    """x @ params[name], transparently decoding quantized weights with the
    per-output-channel scale applied to the small output. Two 8-bit
    containers share the int8 dtype: LINEAR int8 (key ``name+"_iscale"``;
    one hardware convert, the TPU-native choice) and e4m3 bits (key
    ``name+"_scale"``; 9-int-op/4-elem VPU bit decode). ``params`` holds
    either full stacked weights (head/lm use) or one scan slice."""
    w = params[name]
    if name + "_iscale" in params:
        y = x @ w.astype(x.dtype)  # int8 -> bf16 is exact (|w| <= 127)
        return (y.astype(jnp.float32) * params[name + "_iscale"]).astype(
            x.dtype)
    if w.dtype == jnp.int8:
        from flashinfer_tpu.ops.fp8 import e4m3_bits_to_bf16

        y = x @ e4m3_bits_to_bf16(w).astype(x.dtype)
        return (y.astype(jnp.float32) * params[name + "_scale"]).astype(
            x.dtype)
    return x @ w


def _run_layers(params, mc, num_pages, x, positions, k_cache, v_cache,
                dplan, page_ids, entry_ids, valid, interpret, kv_fp8,
                kv_scale, kv_layout="NHD"):
    """All transformer layers via lax.scan over the stacked [L, ...] weight
    axis. One trace regardless of depth, and — decisive for fp8 weights —
    exactly ONE layer's dequantized bf16 temporaries are live at a time
    (the Python-unrolled loop let XLA's buffer assignment keep several
    layers' dequants alive, OOMing 8B prefill; docs/PERF.md round-2 note).

    x: [rows, hidden]; page_ids are LOCAL (layer offset applied in-body).
    Reference analogue: the engines the reference serves iterate layers
    over one persistent workspace (prefill.py:1226 wrappers)."""
    rows = x.shape[0]
    d = mc.head_dim
    hq, hkv = mc.num_qo_heads, mc.num_kv_heads
    scan_params = {k: v for k, v in params.items() if _is_per_layer(k)}

    def body(carry, xs):
        x, kc, vc = carry
        lp, layer = xs
        xn = rmsnorm(x, lp["attn_norm"], mc.rms_eps)
        if "wqkv" in lp:
            qkv = _wmm(xn, lp, "wqkv")
            q = qkv[:, : hq * d].reshape(rows, hq, d)
            k = qkv[:, hq * d : (hq + hkv) * d].reshape(rows, hkv, d)
            v = qkv[:, (hq + hkv) * d :].reshape(rows, hkv, d)
        else:
            q = _wmm(xn, lp, "wq").reshape(rows, hq, d)
            k = _wmm(xn, lp, "wk").reshape(rows, hkv, d)
            v = _wmm(xn, lp, "wv").reshape(rows, hkv, d)
        q, k = apply_rope_pos_ids(q, k, positions, rope_theta=mc.rope_theta)

        k_scale, v_scale = kv_scale
        if kv_fp8 == "int8":  # linear int8 container (per-tensor scale)
            k = jnp.clip(jnp.round(k.astype(jnp.float32) / k_scale),
                         -127, 127).astype(jnp.int8)
            v = jnp.clip(jnp.round(v.astype(jnp.float32) / v_scale),
                         -127, 127).astype(jnp.int8)
        elif kv_fp8:  # e4m3 bits (int8 container; ops/fp8.py rationale)
            k = jax.lax.bitcast_convert_type(
                (k.astype(jnp.float32) / k_scale).astype(jnp.float8_e4m3fn),
                jnp.int8)
            v = jax.lax.bitcast_convert_type(
                (v.astype(jnp.float32) / v_scale).astype(jnp.float8_e4m3fn),
                jnp.int8)
        # in-place scatter into the global page space (drop padding rows)
        pids = jnp.where(valid, page_ids + layer * num_pages, kc.shape[0])
        if kv_layout == "HND":
            # [pages, kvh, ps, d]: advanced (page, entry) indices around the
            # head slice -> value [rows, kvh, d]
            kc = kc.at[pids, :, entry_ids].set(k.astype(kc.dtype), mode="drop")
            vc = vc.at[pids, :, entry_ids].set(v.astype(vc.dtype), mode="drop")
        else:
            kc = kc.at[pids, entry_ids].set(k.astype(kc.dtype), mode="drop")
            vc = vc.at[pids, entry_ids].set(v.astype(vc.dtype), mode="drop")
        attn = run_device_plan(
            dplan, q, kc, vc, kv_layout=TensorLayout[kv_layout],
            k_scale=k_scale, v_scale=v_scale,
            kv_dtype=(kv_fp8 or None),
            kv_indices_offset=layer * num_pages, interpret=interpret,
        )
        x = x + _wmm(attn.reshape(rows, hq * d), lp, "wo").astype(x.dtype)
        xn = rmsnorm(x, lp["mlp_norm"], mc.rms_eps)
        x = x + _wmm(silu_and_mul(_wmm(xn, lp, "w_gate_up")),
                     lp, "w_down").astype(x.dtype)
        return (x, kc, vc), None

    with jax.named_scope("fi_layers"):
        (x, k_cache, v_cache), _ = jax.lax.scan(
            body, (x, k_cache, v_cache),
            (scan_params, jnp.arange(mc.num_layers, dtype=jnp.int32)),
        )
    return x, k_cache, v_cache


@functools.partial(
    jax.jit,
    static_argnums=(1, 2, 3),
    static_argnames=("interpret", "kv_fp8", "kv_scale", "greedy",
                     "kv_layout"),
    donate_argnums=(4, 5),
)
def _decode_step(params, mc, page_size, page_bucket, k_cache, v_cache,
                 blob, dplan, key, sample_args, *, interpret, greedy,
                 kv_fp8=False, kv_scale=(1.0, 1.0), kv_layout="NHD"):
    B = (blob.shape[0] - page_bucket - 1) // 5
    tokens = blob[:B]
    positions = blob[B : 2 * B]
    valid = blob[2 * B : 3 * B] != 0
    kv_indices = blob[3 * B : 3 * B + page_bucket]
    kv_indptr = blob[3 * B + page_bucket : 4 * B + page_bucket + 1]
    kv_last = blob[4 * B + page_bucket + 1 :]
    x = params["embedding"][tokens]
    B = tokens.shape[0]
    num_pages = k_cache.shape[0] // mc.num_layers
    page_slot = positions // page_size
    page_ids = kv_indices[kv_indptr[jnp.arange(B, dtype=jnp.int32)] + page_slot]
    entry_ids = positions % page_size
    x, k_cache, v_cache = _run_layers(
        params, mc, num_pages, x, positions, k_cache, v_cache,
        dplan, page_ids, entry_ids, valid, interpret, kv_fp8, kv_scale,
        kv_layout,
    )
    x = rmsnorm(x, params["final_norm"], mc.rms_eps)
    logits = _wmm(x, params, "lm_head").astype(jnp.float32)
    toks = _sample_tokens(logits, key, sample_args, greedy)
    return toks, k_cache, v_cache


@functools.partial(
    jax.jit,
    static_argnums=(1, 2, 3),
    static_argnames=("plan_meta", "interpret", "kv_fp8", "kv_scale",
                     "greedy", "kv_layout"),
    donate_argnums=(4, 5),
)
def _decode_window_step(params, mc, page_size, page_bucket, k_cache, v_cache,
                        step_blobs, plan_blobs, keys, sample_args, *,
                        plan_meta, interpret, greedy, kv_fp8=False,
                        kv_scale=(1.0, 1.0), kv_layout="NHD"):
    """lax.scan over N pre-planned decode steps (EngineConfig.decode_window):
    each step appends KV, runs the paged kernel, samples, and feeds its
    sampled tokens to the next step — no host round trip between tokens.
    step_blobs [N, 5B + page_bucket + 1] int32; plan_blobs [N, plan_total]
    (all N share plan_meta). Returns tokens [N, B]."""
    from flashinfer_tpu.ops.attention.batch import DevicePlan

    B = (step_blobs.shape[1] - page_bucket - 1) // 5
    num_pages = k_cache.shape[0] // mc.num_layers

    def body(carry, xs):
        kc, vc, toks = carry
        blob, pblob, key = xs
        dplan = DevicePlan(pblob, meta=plan_meta)
        positions = blob[B : 2 * B]
        valid = blob[2 * B : 3 * B] != 0
        kv_indices = blob[3 * B : 3 * B + page_bucket]
        kv_indptr = blob[3 * B + page_bucket : 4 * B + page_bucket + 1]
        x = params["embedding"][toks]
        page_slot = positions // page_size
        page_ids = kv_indices[
            kv_indptr[jnp.arange(B, dtype=jnp.int32)] + page_slot]
        entry_ids = positions % page_size
        x, kc, vc = _run_layers(
            params, mc, num_pages, x, positions, kc, vc, dplan,
            page_ids, entry_ids, valid, interpret, kv_fp8, kv_scale,
            kv_layout)
        x = rmsnorm(x, params["final_norm"], mc.rms_eps)
        logits = _wmm(x, params, "lm_head").astype(jnp.float32)
        nt = _sample_tokens(logits, key, sample_args, greedy)
        return (kc, vc, nt), nt

    tokens0 = step_blobs[0, :B]
    (k_cache, v_cache, _), toks = jax.lax.scan(
        body, (k_cache, v_cache, tokens0), (step_blobs, plan_blobs, keys))
    return toks, k_cache, v_cache


def _sample_tokens(logits, key, sample_args, greedy):
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temperature, top_k, top_p = sample_args
    probs = softmax(logits, temperature=temperature)
    return top_k_top_p_sampling_from_probs(probs, key, top_k, top_p).astype(
        jnp.int32)


@functools.partial(
    jax.jit,
    static_argnums=(1, 2),
    static_argnames=("interpret", "kv_fp8", "kv_scale", "greedy",
                     "kv_layout"),
    donate_argnums=(3, 4),
)
def _prefill_step(params, mc, page_size, k_cache, v_cache, tokens, positions,
                  batch_idx, valid, kv_indices, kv_indptr, kv_last, dplan,
                  last_rows, key, sample_args, *, interpret, greedy,
                  kv_fp8=False, kv_scale=(1.0, 1.0), kv_layout="NHD"):
    x = params["embedding"][tokens]
    num_pages = k_cache.shape[0] // mc.num_layers
    page_slot = positions // page_size
    page_ids = kv_indices[kv_indptr[batch_idx] + page_slot]
    entry_ids = positions % page_size
    x, k_cache, v_cache = _run_layers(
        params, mc, num_pages, x, positions, k_cache, v_cache,
        dplan, page_ids, entry_ids, valid, interpret, kv_fp8, kv_scale,
        kv_layout,
    )
    x = rmsnorm(x, params["final_norm"], mc.rms_eps)
    x_last = x[last_rows]
    logits = _wmm(x_last, params, "lm_head").astype(jnp.float32)
    toks = _sample_tokens(logits, key, sample_args, greedy)
    return toks, k_cache, v_cache


@functools.partial(
    jax.jit,
    static_argnums=(1, 2),
    static_argnames=("interpret", "kv_fp8", "kv_scale", "kv_layout"),
    donate_argnums=(3, 4),
)
def _score_step(params, mc, page_size, k_cache, v_cache, tokens, positions,
                batch_idx, valid, kv_indices, kv_indptr, dplan, *,
                interpret, kv_fp8=False, kv_scale=(1.0, 1.0), kv_layout="NHD"):
    """Prefill body without sampling: logits for EVERY row (score API)."""
    x = params["embedding"][tokens]
    num_pages = k_cache.shape[0] // mc.num_layers
    page_slot = positions // page_size
    page_ids = kv_indices[kv_indptr[batch_idx] + page_slot]
    entry_ids = positions % page_size
    x, k_cache, v_cache = _run_layers(
        params, mc, num_pages, x, positions, k_cache, v_cache,
        dplan, page_ids, entry_ids, valid, interpret, kv_fp8, kv_scale,
        kv_layout,
    )
    x = rmsnorm(x, params["final_norm"], mc.rms_eps)
    logits = _wmm(x, params, "lm_head").astype(jnp.float32)
    return logits, k_cache, v_cache


@functools.partial(
    jax.jit,
    static_argnums=(1, 2, 3, 4, 5, 6),
    static_argnames=("interpret", "kv_fp8", "kv_scale", "greedy",
                     "kv_layout"),
    donate_argnums=(7, 8),
)
def _spec_verify_step(params, mc, page_size, page_bucket, bucket, B, G,
                      k_cache, v_cache, blob, dplan, key, sample_args, *,
                      interpret, greedy, kv_fp8=False, kv_scale=(1.0, 1.0),
                      kv_layout="NHD"):
    """Verify G draft tokens per slot in one qo=G+1 batch run.

    Returns [B, G+1] emitted tokens, -1 after the first rejection: the
    accepted draft prefix plus one bonus token (greedy: argmax continuation;
    sampled: chain_speculative_sampling with one-hot draft distributions —
    the correct rejection-sampling treatment of a deterministic proposer,
    preserving the target distribution exactly)."""
    rows = G + 1
    o = 0
    tokens = blob[o : o + bucket]; o += bucket
    positions = blob[o : o + bucket]; o += bucket
    batch_idx = blob[o : o + bucket]; o += bucket
    valid = blob[o : o + bucket] != 0; o += bucket
    draft_toks = blob[o : o + B * G].reshape(B, G); o += B * G
    kv_indices = blob[o : o + page_bucket]; o += page_bucket
    kv_indptr = blob[o : o + B + 2]; o += B + 2
    del blob

    x = params["embedding"][tokens]
    num_pages = k_cache.shape[0] // mc.num_layers
    page_slot = positions // page_size
    page_ids = kv_indices[kv_indptr[batch_idx] + page_slot]
    entry_ids = positions % page_size
    x, k_cache, v_cache = _run_layers(
        params, mc, num_pages, x, positions, k_cache, v_cache,
        dplan, page_ids, entry_ids, valid, interpret, kv_fp8, kv_scale,
        kv_layout,
    )
    x = rmsnorm(x, params["final_norm"], mc.rms_eps)
    logits = _wmm(x[: B * rows], params, "lm_head").astype(jnp.float32)
    logits = logits.reshape(B, rows, -1)

    if greedy:
        out = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, rows]
        match = out[:, :G] == draft_toks
        # row j is emitted iff every draft before it matched (j=0 always)
        keep = jnp.concatenate(
            [jnp.ones((B, 1), bool), jnp.cumprod(match, axis=1).astype(bool)],
            axis=1,
        )
        emitted = jnp.where(keep, out, -1)
    else:
        from flashinfer_tpu.ops.sampling import (
            chain_speculative_sampling,
            top_k_renorm_probs,
            top_p_renorm_probs,
        )

        temperature, top_k, top_p = sample_args
        probs = softmax(logits.reshape(B * rows, -1),
                        temperature=temperature)
        probs = top_k_renorm_probs(probs, top_k)
        probs = top_p_renorm_probs(probs, top_p)
        target = probs.reshape(B, rows, -1)
        vocab = target.shape[-1]
        draft_probs = jax.nn.one_hot(draft_toks, vocab, dtype=jnp.float32)
        emitted, _, _ = chain_speculative_sampling(
            draft_probs, draft_toks, target, key
        )
    return emitted, k_cache, v_cache
