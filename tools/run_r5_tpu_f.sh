#!/bin/bash
set -uo pipefail
cd /root/repo
L=artifacts
python tools/probe_coarsest.py > $L/probe_coarsest_floor.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5g_fast.log 2>&1
python bench.py > $L/bench_r5g_fast.log 2>&1
python tools/compare_reference.py --canvas 9000x4000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_9000 \
  > $L/h2h36_r5g_fast.log 2>&1
echo DONE > $L/r5_tpu_f.done
