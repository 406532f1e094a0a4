#!/bin/bash
# Round-5 campaign addendum: the 8B serving rows failed in r5 with
# remote-compile RESOURCE_EXHAUSTED — the default --num-pages 4096 KV pool
# (8.6 GB int8 at 8B shapes) plus 8 GB of 8-bit weights oversubscribes the
# 16 GB chip. Right-size the pool (1024 pages = 2.1 GB, ample for b16 at
# these context lengths) and re-run; plus the interleaved MLA dtype ratios.
set -x
cd /root/repo
LOG=benchmarks/hw_campaign.log
date -u >> $LOG
echo "=== r5b addendum (8B right-sized pool + interleaved MLA)" >> $LOG

# 1. 8B serving, device-step decomposition, 1024-page pool
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --num-pages 1024 --kv-dtype fp8_e4m3 --weight-dtype fp8_e4m3 --device-step >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --num-pages 1024 --kv-dtype fp8_e4m3 --weight-dtype int8 --device-step >> $LOG 2>&1
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --num-pages 1024 --kv-dtype int8 --weight-dtype int8 --device-step >> $LOG 2>&1

# 2. 8B decode-window (device-feedback scan; amortizes tunnel + host plan)
timeout 5400 python benchmarks/flashinfer_tpu_benchmark.py --routine serving --model 8b --batch-size 16 \
  --num-pages 1024 --kv-dtype int8 --weight-dtype int8 --decode-window 8 >> $LOG 2>&1

# 3. Interleaved MLA dtype ratios (same-process alternating; the 2x
#    cross-process chip-speed drift makes separate runs incomparable)
timeout 2400 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 128 --page-size 64 --kv-dtype all >> $LOG 2>&1
timeout 2400 python benchmarks/flashinfer_tpu_benchmark.py --routine mla \
  --batch-size 32 --s-kv 2048 --num-qo-heads 16 --page-size 64 --kv-dtype all >> $LOG 2>&1

date -u >> $LOG
echo R5B-ADDENDUM-DONE >> $LOG
