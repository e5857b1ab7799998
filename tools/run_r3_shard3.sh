#!/bin/bash
cd /root/repo
echo "=== tiled_overhead 2250 (jnp-in-shardmap, cached jit) $(date)"
timeout 3600 python tools/bench_tiled_overhead.py --canvas 2250x1000 --window > tiled_overhead_r3_2250c.log 2>&1
echo "=== tiled_overhead 4500 $(date)"
timeout 5400 python tools/bench_tiled_overhead.py --canvas 4500x2000 --window > tiled_overhead_r3_4500c.log 2>&1
echo "=== check_pallas --shardmap (prod + canary) $(date)"
timeout 3600 python tools/check_pallas.py --shardmap > check_shardmap_r3b.log 2>&1
echo "=== done $(date)"
