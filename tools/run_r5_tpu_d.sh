#!/bin/bash
# Round-5 serial TPU batch D: gates + benches for the E1 (half-res
# blend) + E2 (pyr_stop 64) fast-preset levers and the canary defer.
set -uo pipefail
cd /root/repo
L=artifacts
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5e_fast.log 2>&1
python tools/bench_tiled_overhead.py --canvas 2250x1000 --window \
  > $L/tiled_overhead_r5e_2250.log 2>&1
python tools/bench_tiled_overhead.py --canvas 4500x2000 --window \
  > $L/tiled_overhead_r5e_4500.log 2>&1
python bench.py > $L/bench_r5e_fast.log 2>&1
PANOSTITCH_BENCH_ALG=pixflow_low python bench.py > $L/bench_r5e_parity.log 2>&1
python tools/compare_reference.py --canvas 9000x4000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_9000 \
  > $L/h2h36_r5e_fast.log 2>&1
echo DONE > $L/r5_tpu_d.done
echo DONE
