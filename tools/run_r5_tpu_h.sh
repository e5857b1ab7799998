#!/bin/bash
# Final round-5 TPU batch: full gate battery + benches in the shipping
# configuration (fast presets: 0.8 pyramid, 64px floor + init-floor,
# cph1, half-res blend; canary auto).  Doubles as the final cache warm.
set -uo pipefail
cd /root/repo
L=artifacts
python bench.py > $L/bench_r5_final_fast.log 2>&1
python tools/compare_reference.py --canvas 9000x4000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_9000 \
  > $L/h2h36_r5_final_fast.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5_final_fast.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_search_20_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250_s20 \
  > $L/h2h_r5_final_s20fast.log 2>&1
PANOSTITCH_BENCH_ALG=pixflow_low python bench.py > $L/bench_r5_final_parity.log 2>&1
echo DONE > $L/r5_tpu_h.done
