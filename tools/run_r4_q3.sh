#!/bin/bash
# Round-4 TPU queue 3: sharded-program validation with kernels + the
# new warp kernel inside shard_map (defaults now ON).
cd /root/repo
python tools/probe_nan_r4.py 2000x2048 > artifacts/probe_nan_r4b_pair.log 2>&1
python tools/probe_nan_r4.py 2000x2048 --top > artifacts/probe_nan_r4b_top.log 2>&1
python tools/check_pallas.py --shardmap > artifacts/check_shardmap_r4.log 2>&1
echo done > artifacts/q3.done
