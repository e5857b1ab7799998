#!/bin/bash
set -uo pipefail
cd /root/repo
L=artifacts
python tools/probe_r5_levers.py > $L/probe_r5_levers_b.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low \
  --backend tpu --test_dir .cache/refcmp_2250 > $L/h2h_r5b_low.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast \
  --backend tpu --test_dir .cache/refcmp_2250 > $L/h2h_r5b_fast.log 2>&1
PANOSTITCH_HYBRID_RESIZE=seg python tools/bench_tiled_overhead.py \
  --canvas 4500x2000 --window > $L/tiled_overhead_r5seg_4500.log 2>&1
python tools/bench_tiled_overhead.py --canvas 4500x2000 --window \
  > $L/tiled_overhead_r5d_4500.log 2>&1
echo DONE
