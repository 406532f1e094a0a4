"""On-hardware Mosaic compile battery / legality GATE: every attention
feature combination (plus the fp8 serving shapes, MLA, grouped-GEMM MoE and
the fused sampler) compiled+run on a real TPU — the CPU suite runs Pallas
in interpret mode and cannot catch Mosaic layout/tiling legality errors.

Run: python benchmarks/tpu_compile_check.py — prints OK/FAIL per feature,
ends with a "MOSAIC-GATE: ..." summary line, and exits nonzero on any
failure. bench.py runs this before the headline timing every round (the
driver-visible gate the round-2 review asked for)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time

# Persistent compile cache for the gate itself: without it every run
# cold-compiles every case through the (slow, sometimes congested) tunnel —
# the r4 "decode long-ctx split-kv (704.1s)" outlier was indistinguishable
# from a regression. With the cache, warm runs are seconds and a budget
# overrun MEANS something.
_CACHE_DIR = "/tmp/jax_cache_tpu_gate"
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    _cache_entries = len(os.listdir(_CACHE_DIR))
except OSError:
    _cache_entries = 0
CACHE_STATE = "warm" if _cache_entries else "cold"
print(f"gate compile cache: {CACHE_STATE} ({_cache_entries} entries in "
      f"{_CACHE_DIR})", flush=True)

import flashinfer_tpu as fi
from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper

rng = np.random.default_rng(0)
failures = []
slow = []
# Per-case wall budget (compile+run). Cold compiles through the tunnel are
# allowed 4x. Overruns are reported (and counted in the summary) but are
# not legality failures — they exist so a 700s case reads as "cold cache /
# tunnel congestion" or "regression", never as silent noise.
_BUDGET_S = 90.0
def report(name, fn, budget=_BUDGET_S):
    t0 = time.perf_counter()
    limit = budget if CACHE_STATE == "warm" else 4 * budget
    try:
        out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        tag = "OK  "
        if dt > limit:
            slow.append((name, round(dt, 1)))
            tag = "SLOW"
        print(f"{tag} {name} ({dt:.1f}s; {CACHE_STATE} budget {limit:.0f}s)",
              flush=True)
    except Exception as e:
        failures.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)

B, HQ, HKV, D, PS = 4, 8, 2, 128, 32
kv_lens = [700, 1500, 64, 3000]
pages = [-(-l//PS) for l in kv_lens]
indptr = np.concatenate([[0], np.cumsum(pages)]).astype(np.int32)
indices = np.arange(sum(pages), dtype=np.int32)
last = np.asarray([l-(p-1)*PS for l,p in zip(kv_lens,pages)], np.int32)
kc = jnp.asarray(rng.standard_normal((sum(pages)+1, HKV, PS, D)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((sum(pages)+1, HKV, PS, D)), jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)

def decode_variant(**plan_kw):
    w = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="HND", backend="pallas")
    w.plan(indptr, indices, last, HQ, HKV, D, PS, **plan_kw)
    return jax.jit(lambda q, kc, vc: w.run(q, (kc, vc)))(q, kc, vc)

report("decode long-ctx split-kv", lambda: decode_variant(kv_chunk_size=512))
report("decode soft-cap variant", lambda: decode_variant(logits_soft_cap=30.0))
report("decode sliding window", lambda: decode_variant(window_left=256))

def sink():
    w = fi.BatchAttentionWithAttentionSinkWrapper(
        sink=jnp.full((HQ,), 2.0), kv_layout="HND", backend="pallas")
    w.plan(np.arange(B+1), indptr, indices, last, HQ, HKV, D, PS)
    return jax.jit(lambda q, kc, vc: w.run(q, (kc, vc)))(q, kc, vc)
report("attention sink wrapper", sink)

def mla():
    dckv, dkpe = 512, 64
    mkv = [256, 640]
    mpages = [-(-l//PS) for l in mkv]
    mindptr = np.concatenate([[0], np.cumsum(mpages)]).astype(np.int32)
    mindices = np.arange(sum(mpages), dtype=np.int32)
    ckv = jnp.asarray(rng.standard_normal((sum(mpages)+1, PS, dckv)), jnp.bfloat16)
    kpe = jnp.asarray(rng.standard_normal((sum(mpages)+1, PS, dkpe)), jnp.bfloat16)
    qn = jnp.asarray(rng.standard_normal((2, 16, dckv)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((2, 16, dkpe)), jnp.bfloat16)
    w = BatchMLAPagedAttentionWrapper(backend="pallas")
    w.plan(np.arange(3), mindptr, mindices, np.asarray(mkv), 16, dckv, dkpe, PS)
    return jax.jit(lambda a,b,c,d: w.run(a,b,c,d))(qn, qp, ckv, kpe)
report("MLA decode", mla)

def fp8_prefill():
    qo_indptr = np.arange(B+1) * 64
    qq = jnp.asarray(rng.standard_normal((B*64, HQ, D)), jnp.bfloat16)
    k8 = kc.astype(jnp.float8_e4m3fn); v8 = vc.astype(jnp.float8_e4m3fn)
    w = fi.BatchPrefillWithPagedKVCacheWrapper(kv_layout="HND", backend="pallas")
    w.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS, causal=True)
    return jax.jit(lambda q,k,v: w.run(q,(k,v),k_scale=0.1,v_scale=0.1))(qq,k8,v8)
report("fp8 paged prefill", fp8_prefill)

def custom_variant():
    from flashinfer_tpu.ops.attention.variants import FlashSigmoid
    w = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="HND", backend="pallas")
    # FlashSigmoid needs non-softmax... skip; use alibi default variant instead
    w.plan(indptr, indices, last, HQ, HKV, D, PS)
    return jax.jit(lambda q, kc, vc: w.run(q, (kc, vc), return_lse=True))(q, kc, vc)
report("decode return_lse", custom_variant)


def packed_mask_prefill():
    qo_lens = [16, 8, 4, 12]
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)
    masks = np.concatenate([
        (rng.random(qo * kv) > 0.3) for qo, kv in zip(qo_lens, kv_lens)
    ])
    packed = np.packbits(masks)
    qq = jnp.asarray(rng.standard_normal((qo_indptr[-1], HQ, D)), jnp.bfloat16)
    w = fi.BatchPrefillWithPagedKVCacheWrapper(kv_layout="HND", backend="pallas")
    w.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS,
           kv_len_arr=np.asarray(kv_lens), packed_custom_mask=packed)
    return jax.jit(lambda q, k, v: w.run(q, (k, v)))(qq, kc, vc)
report("packed custom mask prefill", packed_mask_prefill)


def fp8_mask_decode():
    k8 = kc.astype(jnp.float8_e4m3fn)
    v8 = vc.astype(jnp.float8_e4m3fn)
    masks = np.concatenate([(rng.random(kv) > 0.2) for kv in kv_lens])
    w = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="HND", backend="pallas")
    w.plan(indptr, indices, last, HQ, HKV, D, PS,
           kv_len_arr=np.asarray(kv_lens), custom_mask=masks)
    return jax.jit(lambda q, k, v: w.run(q, (k, v), k_scale=0.1, v_scale=0.1))(
        q, k8, v8)
report("fp8 KV + custom mask decode (permuted mask columns)", fp8_mask_decode)


def fused_sampler():
    from flashinfer_tpu.ops.sampling import top_k_top_p_sampling_from_probs
    probs = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((16, 32000)), jnp.float32))
    return top_k_top_p_sampling_from_probs(
        probs, jax.random.PRNGKey(0), 40, 0.9, backend="pallas")
report("fused top-k/top-p sampler kernel", fused_sampler)


# --------------------------------------------------------------------------
# round-3 additions: fp8 serving shapes (NHD engine layout, page 32, 8B head
# counts), fp8 MLA bit decode, grouped-GEMM MoE, qo>1 spec verify

def engine_fp8_decode_8b():
    from flashinfer_tpu.ops.attention.batch import run_device_plan
    from flashinfer_tpu.utils import TensorLayout
    hq8, hkv8, d8, ps8 = 32, 8, 128, 32  # Llama-3-8B heads, engine page 32
    lens = [190, 512, 64, 1024]
    pg = [-(-l//ps8) for l in lens]
    ip = np.concatenate([[0], np.cumsum(pg)]).astype(np.int32)
    ix = np.arange(sum(pg), dtype=np.int32)
    la = np.asarray([l-(p-1)*ps8 for l, p in zip(lens, pg)], np.int32)
    k8 = jnp.asarray(rng.integers(-100, 100, (sum(pg)+1, ps8, hkv8, d8)),
                     jnp.int8)  # NHD int8-container e4m3 (engine layout)
    v8 = jnp.asarray(rng.integers(-100, 100, (sum(pg)+1, ps8, hkv8, d8)),
                     jnp.int8)
    qq = jnp.asarray(rng.standard_normal((4, hq8, d8)), jnp.bfloat16)
    w = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD",
                                              backend="pallas")
    w.plan(ip, ix, la, hq8, hkv8, d8, ps8, kv_len_arr=np.asarray(lens),
           kv_chunk_size=512)
    return jax.jit(lambda q, k, v: run_device_plan(
        w.device_plan, q, k, v, kv_layout=TensorLayout.NHD,
        k_scale=0.05, v_scale=0.05, kv_dtype="e4m3"))(qq, k8, v8)
report("engine fp8 decode (NHD p32 8B heads, int8 e4m3)", engine_fp8_decode_8b)


def engine_prefill_8b():
    hq8, hkv8, d8, ps8 = 32, 8, 128, 32
    lens = [128, 128]
    pg = [-(-l//ps8) for l in lens]
    ip = np.concatenate([[0], np.cumsum(pg)]).astype(np.int32)
    ix = np.arange(sum(pg), dtype=np.int32)
    la = np.asarray([l-(p-1)*ps8 for l, p in zip(lens, pg)], np.int32)
    kcN = jnp.asarray(rng.standard_normal((sum(pg)+1, ps8, hkv8, d8)),
                      jnp.bfloat16)
    vcN = jnp.asarray(rng.standard_normal((sum(pg)+1, ps8, hkv8, d8)),
                      jnp.bfloat16)
    qq = jnp.asarray(rng.standard_normal((256, hq8, d8)), jnp.bfloat16)
    w = fi.BatchPrefillWithPagedKVCacheWrapper(
        kv_layout="NHD", backend="pallas", tile_q=256)
    w.plan(np.asarray([0, 128, 256]), ip, ix, la, hq8, hkv8, d8, ps8,
           causal=True)
    return jax.jit(lambda q, k, v: w.run(q, (k, v)))(qq, kcN, vcN)
report("engine prefill (NHD tile_q 256, 8B heads)", engine_prefill_8b)


def fp8_mla():
    dckv, dkpe = 512, 64
    mkv = [256, 640]
    mpages = [-(-l//PS) for l in mkv]
    mindptr = np.concatenate([[0], np.cumsum(mpages)]).astype(np.int32)
    mindices = np.arange(sum(mpages), dtype=np.int32)
    ckv8 = jnp.asarray(
        rng.integers(-100, 100, (sum(mpages)+1, PS, dckv)), jnp.int8)
    kpe8 = jnp.asarray(
        rng.integers(-100, 100, (sum(mpages)+1, PS, dkpe)), jnp.int8)
    qn = jnp.asarray(rng.standard_normal((2, 16, dckv)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((2, 16, dkpe)), jnp.bfloat16)
    w = BatchMLAPagedAttentionWrapper(backend="pallas")
    w.plan(np.arange(3), mindptr, mindices, np.asarray(mkv), 16, dckv, dkpe,
           PS)
    return jax.jit(lambda a, b, c, d: w.run(
        a, b, c, d, ckv_scale=0.07, kpe_scale=0.07))(qn, qp, ckv8, kpe8)
report("fp8 MLA decode (int8 e4m3 ckv/kpe bit decode)", fp8_mla)


def moe_grouped_gemm_fp8():
    from flashinfer_tpu.ops.fused_moe import fused_moe, route_tokens
    m, hidden, inter, e = 256, 512, 384, 4
    x = jnp.asarray(rng.standard_normal((m, hidden)) * 0.3, jnp.bfloat16)
    w13 = jnp.asarray(rng.integers(-100, 100, (e, 2*inter, hidden)),
                      jnp.int8)
    w2m = jnp.asarray(rng.integers(-100, 100, (e, hidden, inter)), jnp.int8)
    lg = jnp.asarray(rng.standard_normal((m, e)), jnp.float32)
    ids, scales = route_tokens(lg, 2)
    s = jnp.full((e,), 0.05, jnp.float32)
    return fused_moe(x, w13, w2m, ids, scales, w13_scale=s, w2_scale=s,
                     backend="pallas")
report("grouped-GEMM MoE (fp8 in-kernel dequant)", moe_grouped_gemm_fp8)


def spec_verify_qo5():
    rows = 5  # G=4 drafts + current
    qo_indptr = np.arange(B+1) * rows
    qq = jnp.asarray(rng.standard_normal((B*rows, HQ, D)), jnp.bfloat16)
    w = fi.BatchPrefillWithPagedKVCacheWrapper(kv_layout="HND",
                                               backend="pallas")
    w.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS, causal=True,
           kv_chunk_size=512)
    return jax.jit(lambda q, k, v: w.run(q, (k, v)))(qq, kc, vc)
report("spec-verify decode (qo=5 rows/request)", spec_verify_qo5)


def head_loop_prefill(hq, hkv):
    # tile_q >= 256 + HND routes to the fori_loop-over-heads kernel body
    # (dynamic head indexing of VMEM refs + raised vmem_limit_bytes) — the
    # round-3 prefill-MFU path. Exercises the ragged-wrapper repack too.
    sq = 512
    b = 2
    qo_indptr = np.arange(b+1) * sq
    kv_indptr = np.arange(b+1) * 1024
    qq = jnp.asarray(rng.standard_normal((b*sq, hq, D)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((b*1024, hkv, D)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((b*1024, hkv, D)), jnp.bfloat16)
    w = fi.BatchPrefillWithRaggedKVCacheWrapper(backend="pallas")
    w.plan(qo_indptr, kv_indptr, hq, hkv, D, causal=True)
    return jax.jit(lambda q, k, v: w.run(q, (k, v)))(qq, kk, vv)
report("head-loop ragged prefill (h16, tile_q 512)",
       lambda: head_loop_prefill(16, 16))
report("head-loop ragged prefill (8B GQA 32/8)",
       lambda: head_loop_prefill(32, 8))


def head_loop_fp8_prefill():
    sq = 256
    qo_indptr = np.arange(B+1) * sq
    qq = jnp.asarray(rng.standard_normal((B*sq, HQ, D)), jnp.bfloat16)
    k8 = kc.astype(jnp.float8_e4m3fn); v8 = vc.astype(jnp.float8_e4m3fn)
    w = fi.BatchPrefillWithPagedKVCacheWrapper(kv_layout="HND",
                                               backend="pallas")
    w.plan(qo_indptr, indptr, indices, last, HQ, HKV, D, PS, causal=True)
    return jax.jit(lambda q,k,v: w.run(q,(k,v),k_scale=0.1,v_scale=0.1))(
        qq, k8, v8)
report("head-loop fp8 paged prefill (tile_q 256)", head_loop_fp8_prefill)


def engine_hnd_step():
    # EngineConfig(kv_layout="HND") device step at 8B heads on real HW:
    # strided append scatter + HND fp8 decode through _decode_step
    from flashinfer_tpu.models.llama import LlamaConfig
    from flashinfer_tpu.serving import EngineConfig, LlamaServingEngine
    mc = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                     num_layers=2, num_qo_heads=32, num_kv_heads=8,
                     head_dim=128, dtype=jnp.bfloat16)
    cfg = EngineConfig(model=mc, max_batch=2, num_pages=64, page_size=32,
                       max_seq_len=256, greedy=True, interpret=False,
                       kv_layout="HND", kv_dtype="fp8_e4m3", kv_scale=0.3)
    eng = LlamaServingEngine(cfg, seed=0)
    eng.add_request(list(range(2, 40)), 3)
    eng.run_to_completion(max_steps=10)
    return jnp.zeros(())
report("HND-layout fp8 engine step (8B heads)", engine_hnd_step)


def vector_sparse_ps1():
    # page_size=1 vector-sparse decode: ppst must respect the DMA-semaphore
    # cap (tile_k <= 64 pages; an uncapped 256-page unroll exhausts sflag
    # space — r4 tile_candidates fix)
    vlens = [300, 77, 513, 40]
    vindptr = np.concatenate([[0], np.cumsum(vlens)]).astype(np.int32)
    vindices = rng.permutation(sum(vlens)).astype(np.int32)
    vlast = np.ones(4, np.int32)
    kc1 = jnp.asarray(rng.standard_normal((sum(vlens)+1, HKV, 1, D)), jnp.bfloat16)
    vc1 = jnp.asarray(rng.standard_normal((sum(vlens)+1, HKV, 1, D)), jnp.bfloat16)
    w = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="HND", backend="pallas")
    w.plan(vindptr, vindices, vlast, HQ, HKV, D, 1)
    return jax.jit(lambda q, kc, vc: w.run(q, (kc, vc)))(q, kc1, vc1)
report("vector-sparse page_size=1 decode", vector_sparse_ps1)


def decode_window_engine():
    # multi-step decode window: N pre-planned steps in one jitted scan
    from flashinfer_tpu.serving import EngineConfig, LlamaServingEngine
    from flashinfer_tpu.models.llama import LlamaConfig
    mc = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                     num_layers=2, num_qo_heads=8, num_kv_heads=2,
                     head_dim=128)
    cfg = EngineConfig(model=mc, max_batch=2, num_pages=64, page_size=32,
                       max_seq_len=256, greedy=True, interpret=False,
                       decode_window=4)
    eng = LlamaServingEngine(cfg, seed=0)
    eng.add_request(list(range(2, 40)), 9)
    eng.run_to_completion(max_steps=10)
    return jnp.zeros(())
report("decode-window engine (4-step jitted scan)", decode_window_engine)


if failures:
    print(f"MOSAIC-GATE: {len(failures)} FAILURES: {failures}", flush=True)
    sys.exit(1)
if slow:
    print(f"MOSAIC-GATE: all OK ({CACHE_STATE} cache; "
          f"{len(slow)} over budget: {slow})", flush=True)
else:
    print(f"MOSAIC-GATE: all OK ({CACHE_STATE} cache)", flush=True)
