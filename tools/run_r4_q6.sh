#!/bin/bash
# Round-4 TPU queue 6 (consolidated): validate the (64,128)
# bit-compatible warp kernel, re-gate fidelity, restore the overhead
# artifacts, then bisect.  One TPU process at a time.
cd /root/repo
while [ ! -f artifacts/q5.done ]; do sleep 30; done
python tools/check_pallas.py --warp > artifacts/check_warp_128.log 2>&1
python tools/probe_nan_r4.py 2000x2048 > artifacts/probe_nan_r4c_pair.log 2>&1
# 36 MP fidelity with the final kernel
python tools/fidelity_36mp.py run production > artifacts/fid_production_r4b.log 2>&1
python tools/fidelity_36mp.py run nowarpk > artifacts/fid_nowarpk_r4.log 2>&1
python tools/fidelity_36mp.py run fastpreset > artifacts/fid_fastpreset_r4b.log 2>&1
python tools/fidelity_36mp.py run fast_nowindow > artifacts/fid_fast_nowindow_r4b.log 2>&1
python tools/fidelity_36mp.py run search20 > artifacts/fid_search20_r4b.log 2>&1
python tools/fidelity_36mp.py run search20_nowindow > artifacts/fid_search20_nowindow_r4b.log 2>&1
{ python tools/fidelity_36mp.py compare production nowarpk
  python tools/fidelity_36mp.py compare production fastpreset
  python tools/fidelity_36mp.py compare fastpreset fast_nowindow
  python tools/fidelity_36mp.py compare search20 search20_nowindow
} > artifacts/fid_compare_r4b.log 2>&1
# sharded overhead artifacts (expect SSIM ~0.99999 restored)
python tools/bench_tiled_overhead.py --canvas 2250x1000 --window > artifacts/tiled_overhead_r4b_2250.log 2>&1
python tools/bench_tiled_overhead.py --canvas 4500x2000 --window > artifacts/tiled_overhead_r4b_4500.log 2>&1
# bisect the residual shard_map miscompile by kernel class
python tools/probe_bisect_shardmap.py 2250x1000 all nowarp nofused norelax > artifacts/bisect_shardmap_2250.log 2>&1
echo done > artifacts/q6.done
