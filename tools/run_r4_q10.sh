#!/bin/bash
# Round-4 TPU queue 10 (final): overhead artifacts + search20 fidelity
# pair under the shipping (shift-warp-off) configuration.
cd /root/repo
python tools/bench_tiled_overhead.py --canvas 4500x2000 --window > artifacts/tiled_overhead_r4c_4500.log 2>&1
python tools/bench_tiled_overhead.py --canvas 2250x1000 --window > artifacts/tiled_overhead_r4c_2250.log 2>&1
python tools/fidelity_36mp.py run search20 > artifacts/fid_search20_r4c.log 2>&1
python tools/fidelity_36mp.py run search20_nowindow > artifacts/fid_search20_nowindow_r4c.log 2>&1
python tools/fidelity_36mp.py compare search20 search20_nowindow > artifacts/fid_search20_cmp_r4c.log 2>&1
echo done > artifacts/q10.done
