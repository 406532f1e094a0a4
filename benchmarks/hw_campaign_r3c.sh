#!/bin/bash
# Round-3 continuation: the campaign pieces the first r3 session never
# reached (tunnel/time), with the fixed head-loop prefill heuristic.
# Appends to benchmarks/hw_campaign.log.
set -x
cd /root/repo
LOG=benchmarks/hw_campaign.log
date -u >> $LOG
echo "=== r3c (fixed head-loop heuristic)" >> $LOG

# 1. Prefill with the fixed heuristic (expect ~41 TFLOPs at h16)
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 8 --s-qo 1024 --s-kv 1024 --num-qo-heads 16 --num-kv-heads 16 --causal >> $LOG 2>&1
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 8 --s-qo 1024 --s-kv 1024 --num-qo-heads 32 --num-kv-heads 8 --causal >> $LOG 2>&1
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchPrefillWithRaggedKVCacheWrapper \
  --batch-size 2 --s-qo 4096 --s-kv 4096 --num-qo-heads 32 --num-kv-heads 8 --causal >> $LOG 2>&1

# 2. fp8 MLA decode (bf16 row measured 13:51: 0.1312 ms / 575.6 GB/s)
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 128 --page-size 64 --kv-dtype fp8_e4m3 >> $LOG 2>&1

# 3. MoE grouped GEMM TFLOPs (pallas in-kernel-dequant vs xla)
timeout 600 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 >> $LOG 2>&1
timeout 600 python benchmarks/flashinfer_tpu_benchmark.py --routine moe --m 4096 --moe-backend xla >> $LOG 2>&1

# 4. Serving: 1B decode step + 8B fp8
timeout 900 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 1b --batch-size 16 >> $LOG 2>&1
timeout 1200 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 >> $LOG 2>&1

# 5. Decode regression check
timeout 420 python benchmarks/flashinfer_tpu_benchmark.py --routine BatchDecodeWithPagedKVCacheWrapper \
  --batch-size 64 --s-kv 2048 --num-qo-heads 32 --num-kv-heads 8 --page-size 32 >> $LOG 2>&1

# 6. Headline bench
timeout 2400 python bench.py >> $LOG 2>&1
date -u >> $LOG
echo CAMPAIGN-R3C-DONE >> $LOG
