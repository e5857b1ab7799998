#!/bin/bash
# Round-4 TPU queue 9: re-validate + re-measure with shift warp OFF
# (the final shipping configuration).
cd /root/repo
while [ ! -f artifacts/q6d2.done ]; do sleep 20; done
REF=/tmp/refcmp_hua5gvpz/FinalResult_ref.png
python tools/probe_h2h_bisect.py default $REF > artifacts/h2h_final_low.log 2>&1
python bench.py > artifacts/bench_r4_final_headline.log 2>&1
PANOSTITCH_BENCH_ALG=pixflow_low python bench.py > artifacts/bench_r4_final_parity.log 2>&1
python tools/compare_reference.py --backend tpu --flow_alg pixflow_low_fast --skip_ref --test_dir /tmp/refcmp_xgze7rsj > artifacts/compare_ref_r4_fast_final.log 2>&1
python tools/fidelity_36mp.py run production > artifacts/fid_production_r4c.log 2>&1
python tools/fidelity_36mp.py run fastpreset > artifacts/fid_fastpreset_r4c.log 2>&1
python tools/fidelity_36mp.py run fast_nowindow > artifacts/fid_fast_nowindow_r4c.log 2>&1
{ python tools/fidelity_36mp.py compare production fastpreset
  python tools/fidelity_36mp.py compare fastpreset fast_nowindow
} > artifacts/fid_compare_r4c.log 2>&1
echo done > artifacts/q9.done
