#!/bin/bash
# Round-4 TPU queue 5: sharded-overhead artifacts (VERDICT #1/#4),
# per-preset 36 MP fidelity (#6), batched device-time (#7), preset
# benches.  Waits for queue 4 to drain first (one TPU process at a
# time).
cd /root/repo
while [ ! -f artifacts/q4.done ]; do sleep 20; done
python tools/bench_tiled_overhead.py --canvas 2250x1000 --window > artifacts/tiled_overhead_r4_2250.log 2>&1
python tools/bench_tiled_overhead.py --canvas 4500x2000 --window > artifacts/tiled_overhead_r4_4500.log 2>&1
echo overheads done
python tools/fidelity_36mp.py run production > artifacts/fid_production_r4.log 2>&1
python tools/fidelity_36mp.py run fastpreset > artifacts/fid_fastpreset_r4.log 2>&1
python tools/fidelity_36mp.py run fast_nowindow > artifacts/fid_fast_nowindow_r4.log 2>&1
python tools/fidelity_36mp.py run search20 > artifacts/fid_search20_r4.log 2>&1
python tools/fidelity_36mp.py run search20_nowindow > artifacts/fid_search20_nowindow_r4.log 2>&1
{ python tools/fidelity_36mp.py compare production fastpreset
  python tools/fidelity_36mp.py compare fastpreset fast_nowindow
  python tools/fidelity_36mp.py compare search20 search20_nowindow
} > artifacts/fid_compare_r4.log 2>&1
echo fidelity done
python tools/bench_batched.py --canvas 2250x1000 --batch 16 --device > artifacts/bench_r4_batched16.log 2>&1
PANOSTITCH_BENCH_ALG=pixflow_search_20 python bench.py > artifacts/bench_r4_search20.log 2>&1
python tools/bench_stitch4.py > artifacts/bench_r4_stitch4.log 2>&1
python bench.py > artifacts/bench_r4_headline2.log 2>&1
echo done > artifacts/q5.done
