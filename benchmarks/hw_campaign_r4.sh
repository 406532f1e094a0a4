#!/bin/bash
# Round-4 hardware measurement campaign — run with the CPU otherwise idle
# (bench numbers are garbage under pytest load; ADVICE r3 #2).
# Appends to benchmarks/hw_campaign.log; prefill A/B tables additionally
# land in benchmarks/logs/ so PERF.md rows have a checked-in source.
set -x
cd /root/repo
LOG=benchmarks/hw_campaign.log
mkdir -p benchmarks/logs
date -u >> $LOG
echo "=== r4 campaign (idle CPU)" >> $LOG

# 0. Mosaic legality gate
timeout 1800 python benchmarks/tpu_compile_check.py >> $LOG 2>&1 || echo "GATE FAILED" >> $LOG

# 1. ADVICE r3 #2: reproduce the h16 prefill headline with a committed log
timeout 1800 python benchmarks/prefill_ab.py --b 8 --sq 1024 --hq 16 --hkv 16 \
  > benchmarks/logs/prefill_ab_h16_r4.json 2>&1 || echo "AB h16 FAILED" >> $LOG
timeout 1800 python benchmarks/prefill_ab.py --b 8 --sq 1024 --hq 32 --hkv 8 \
  > benchmarks/logs/prefill_ab_gqa_r4.json 2>&1 || echo "AB gqa FAILED" >> $LOG

# 2. Wrapper-path prefill rows (include the glue; heuristic must match A/B)
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 8 --s-qo 1024 --s-kv 1024 --num-qo-heads 16 --num-kv-heads 16 --causal >> $LOG 2>&1
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 8 --s-qo 1024 --s-kv 1024 --num-qo-heads 32 --num-kv-heads 8 --causal >> $LOG 2>&1

# 3. Decode regression check
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchDecodeWithPagedKVCacheWrapper \
  --batch-size 64 --s-kv 2048 --num-qo-heads 32 --num-kv-heads 8 --page-size 32 >> $LOG 2>&1

# 4. MLA decode bf16 + fp8 (fp8 was 149 GB/s physical in r3 — diagnose)
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 128 --page-size 64 >> $LOG 2>&1
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 128 --page-size 64 --kv-dtype fp8_e4m3 >> $LOG 2>&1

# 5. MoE grouped GEMM TFLOPs (pallas vs xla)
timeout 1800 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 >> $LOG 2>&1
timeout 1800 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 --moe-backend xla >> $LOG 2>&1

# 6. Serving: device-step decomposition (1B bf16, NHD vs HND; 8B fp8)
timeout 3600 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 \
  --device-step >> $LOG 2>&1
timeout 3600 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 \
  --device-step --kv-layout HND >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 --device-step >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 --device-step --kv-layout HND >> $LOG 2>&1

# 7. Multi-step decode window (amortizes host planning + tunnel dispatch)
timeout 3600 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 \
  --decode-window 8 >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 --decode-window 8 >> $LOG 2>&1

date -u >> $LOG
echo R4-CAMPAIGN-DONE >> $LOG
