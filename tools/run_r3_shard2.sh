#!/bin/bash
cd /root/repo
echo "=== tiled_overhead 2250x1000 windowed (matmul resize) $(date)"
timeout 3600 python tools/bench_tiled_overhead.py --canvas 2250x1000 --window > tiled_overhead_r3_2250b.log 2>&1
echo "=== tiled_overhead 4500x2000 windowed (matmul resize) $(date)"
timeout 5400 python tools/bench_tiled_overhead.py --canvas 4500x2000 --window > tiled_overhead_r3_4500b.log 2>&1
echo "=== flow level decomposition $(date)"
timeout 3600 python tools/bench_flow_level.py > flowlevel_r3.log 2>&1
echo "=== chain device latency $(date)"
timeout 3600 python tools/bench_chain_device.py > chain_device_r3.log 2>&1
echo "=== done $(date)"
