#!/bin/bash
# Round-5 hardware measurement campaign (VERDICT r4 #1: run it, commit the
# logs, publish device-side 8B numbers). Run with the CPU otherwise idle —
# host load pollutes the differential timing.
# Appends to benchmarks/hw_campaign.log; JSON tables land in benchmarks/logs/.
set -x
cd /root/repo
LOG=benchmarks/hw_campaign.log
mkdir -p benchmarks/logs
date -u >> $LOG
echo "=== r5 campaign (idle CPU)" >> $LOG

# 0. Mosaic legality gate (also warms the new persistent TPU compile cache;
#    prints per-case budgets + cold/warm state)
timeout 3000 python benchmarks/tpu_compile_check.py >> $LOG 2>&1 || echo "GATE FAILED" >> $LOG

# 1. Prefill A/B with the in-session default-wrapper row (VERDICT #2):
#    committed source for the PERF.md prefill table
timeout 1800 python benchmarks/prefill_ab.py --b 8 --sq 1024 --hq 16 --hkv 16 \
  > benchmarks/logs/prefill_ab_h16_r5.json 2>&1 || echo "AB h16 FAILED" >> $LOG
timeout 1800 python benchmarks/prefill_ab.py --b 8 --sq 1024 --hq 32 --hkv 8 \
  > benchmarks/logs/prefill_ab_gqa_r5.json 2>&1 || echo "AB gqa FAILED" >> $LOG

# 2. Decode regression check
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchDecodeWithPagedKVCacheWrapper \
  --batch-size 64 --s-kv 2048 --num-qo-heads 32 --num-kv-heads 8 --page-size 32 >> $LOG 2>&1

# 3. MLA decode: bf16 / fp8-e4m3 / linear-int8 (chunk-cap fix + int8 path).
#    h128 = single-chip DeepSeek (MXU-bound: ~256-512 flops/byte vs the
#    v5e balance of ~240 — byte-rate ratios are the wrong lens there);
#    h16 = the per-chip head count under tp8 (memory-bound: the regime
#    where the 8-bit containers' byte-rate win is physical)
for h in 128 16; do
  for dt in model fp8_e4m3 int8; do
    timeout 1200 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
      --batch-size 32 --s-kv 2048 --num-qo-heads $h --page-size 64 --kv-dtype $dt >> $LOG 2>&1
  done
done

# 4. Kernel decomposition (profiler.cuh analogue): decode, prefill, MLA fp8
timeout 2400 python benchmarks/kernel_decomp.py --routine decode \
  > benchmarks/logs/decomp_decode_r5.json 2>&1 || echo "DECOMP decode FAILED" >> $LOG
timeout 2400 python benchmarks/kernel_decomp.py --routine prefill \
  > benchmarks/logs/decomp_prefill_r5.json 2>&1 || echo "DECOMP prefill FAILED" >> $LOG
timeout 2400 python benchmarks/kernel_decomp.py --routine mla --kv-dtype fp8_e4m3 \
  > benchmarks/logs/decomp_mla_fp8_r5.json 2>&1 || echo "DECOMP mla FAILED" >> $LOG

# 5. MoE grouped GEMM TFLOPs (pallas vs xla)
timeout 1800 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 >> $LOG 2>&1
timeout 1800 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 --moe-backend xla >> $LOG 2>&1

# 6. Serving with device-step decomposition (the north-star denominator)
timeout 3600 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 \
  --device-step >> $LOG 2>&1
timeout 3600 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 \
  --device-step --kv-layout HND >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 --device-step >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype int8 --device-step >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype int8 --device-step --kv-layout HND >> $LOG 2>&1
# the full TPU-native 8-bit config: linear-int8 KV + linear-int8 weights
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype int8 --weight-dtype int8 --device-step >> $LOG 2>&1

# 7. Multi-step decode window (amortizes host planning + tunnel dispatch)
timeout 3600 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 \
  --decode-window 8 >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype int8 --decode-window 8 >> $LOG 2>&1

# 8. Accuracy gate at 1B on hardware (VERDICT #7)
timeout 3600 python benchmarks/accuracy_gate.py --model 1b \
  > benchmarks/logs/accuracy_1b_r5.json 2>&1 || echo "ACC 1B FAILED" >> $LOG
timeout 3600 python benchmarks/accuracy_gate.py --model 8b \
  > benchmarks/logs/accuracy_8b_r5.json 2>&1 || echo "ACC 8B FAILED" >> $LOG

# 9. Headline bench (driver metric)
timeout 2400 python bench.py >> $LOG 2>&1

date -u >> $LOG
echo R5-CAMPAIGN-DONE >> $LOG
