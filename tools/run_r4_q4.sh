#!/bin/bash
# Round-4 TPU queue 4: headline refresh with the warp kernel landed.
cd /root/repo
python bench.py > artifacts/bench_r4_headline.log 2>&1
PANOSTITCH_BENCH_ALG=pixflow_low python bench.py > artifacts/bench_r4_parity.log 2>&1
python tools/bench_flow_level.py > artifacts/flowlevel_r4.log 2>&1
python tools/bench_chain_device.py > artifacts/chain_device_r4.log 2>&1
echo done > artifacts/q4.done
