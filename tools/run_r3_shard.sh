#!/bin/bash
cd /root/repo
echo "=== check_pallas --shardmap $(date)"
timeout 3600 python tools/check_pallas.py --shardmap > check_shardmap_r3.log 2>&1
echo "=== tiled_overhead 2250x1000 windowed $(date)"
timeout 3600 python tools/bench_tiled_overhead.py --canvas 2250x1000 --window > tiled_overhead_r3_2250.log 2>&1
echo "=== tiled_overhead 4500x2000 windowed $(date)"
timeout 5400 python tools/bench_tiled_overhead.py --canvas 4500x2000 --window > tiled_overhead_r3_4500.log 2>&1
echo "=== done $(date)"
