#!/bin/bash
# Round-3 (continuation) hardware measurement campaign — trimmed timeouts
# so the whole thing lands inside the session. Appends to hw_campaign.log.
set -x
cd /root/repo
LOG=benchmarks/hw_campaign.log
date -u >> $LOG

# 0. Mosaic legality gate (includes head-loop prefill shapes)
timeout 1500 python benchmarks/tpu_compile_check.py >> $LOG 2>&1 || echo "GATE FAILED" >> $LOG

# 0.5 Autotune: profile decode+prefill(head_loop)+MLA tactics, persist winners
timeout 1500 python -m flashinfer_tpu tune >> $LOG 2>&1 || echo "TUNE FAILED" >> $LOG

# 1. Prefill MFU (the round-3 headline lever)
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 8 --s-qo 1024 --s-kv 1024 --num-qo-heads 16 --num-kv-heads 16 --causal >> $LOG 2>&1
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 8 --s-qo 1024 --s-kv 1024 --num-qo-heads 32 --num-kv-heads 8 --causal >> $LOG 2>&1
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 2 --s-qo 4096 --s-kv 4096 --num-qo-heads 32 --num-kv-heads 8 --causal >> $LOG 2>&1

# 2. Decode regression check
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchDecodeWithPagedKVCacheWrapper \
  --batch-size 64 --s-kv 2048 --num-qo-heads 32 --num-kv-heads 8 --page-size 32 >> $LOG 2>&1

# 3. MLA decode bandwidth
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 128 --page-size 64 >> $LOG 2>&1
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 128 --page-size 64 --kv-dtype fp8_e4m3 >> $LOG 2>&1

# 4. MoE grouped GEMM TFLOPs
timeout 600 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 >> $LOG 2>&1
timeout 600 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 --moe-backend xla >> $LOG 2>&1

# 5. Serving: 1B decode step + 8B fp8
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 >> $LOG 2>&1
timeout 1200 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 >> $LOG 2>&1
timeout 1200 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 --kv-layout HND >> $LOG 2>&1

# 6. Headline bench
timeout 1500 python bench.py >> $LOG 2>&1
date -u >> $LOG
echo CAMPAIGN-DONE >> $LOG
