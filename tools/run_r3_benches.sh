#!/bin/bash
# Round-3 sequential TPU benches (ONE TPU process at a time).
cd /root/repo
echo "=== headline (fused kernels) $(date)"
python bench.py > bench_r3_headline.log 2>&1
echo "=== batched $(date)"
python tools/bench_batched.py > bench_r3_batched.log 2>&1
echo "=== stitch4 $(date)"
python tools/bench_stitch4.py > bench_r3_stitch4.log 2>&1
echo "=== search_20 36MP $(date)"
PANOSTITCH_BENCH_ALG=pixflow_search_20 python bench.py > bench_r3_search20.log 2>&1
echo "=== done $(date)"
