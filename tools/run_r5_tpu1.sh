#!/bin/bash
# Round-5 serial TPU batch 1: reference-binary head-to-heads (gate
# discipline: the pixflow refactor + hybrid restructure touched the TPU
# compute path) and the tiled-overhead benches on the hybrid path.
# ONE TPU process at a time.
set -uo pipefail
cd /root/repo
L=artifacts

python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low \
  --backend tpu --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5_low.log 2>&1

python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast \
  --backend tpu --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5_fast.log 2>&1

python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_search_20 \
  --backend tpu --test_dir .cache/refcmp_2250_s20 \
  > $L/h2h_r5_s20.log 2>&1

python tools/bench_tiled_overhead.py --canvas 2250x1000 --window \
  > $L/tiled_overhead_r5_2250.log 2>&1

python tools/bench_tiled_overhead.py --canvas 4500x2000 --window \
  > $L/tiled_overhead_r5_4500.log 2>&1

echo DONE
