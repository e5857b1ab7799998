#!/bin/bash
# Round-5 serial TPU batch A (gate discipline for the r5 source
# changes: hybrid restructure + speed levers + MXU resize).
# ONE TPU process at a time; waits for the CPU golden batch's files.
set -uo pipefail
cd /root/repo
L=artifacts

wait_for() {  # wait_for <file> [timeout_s]
  local f=$1 t=${2:-3600} i=0
  while [ ! -e "$f" ] && [ $i -lt $t ]; do sleep 10; i=$((i+10)); done
  [ -e "$f" ] || echo "TIMEOUT waiting for $f"
}

# 1. 36 MP head-to-head, parity preset (the long compile pole).
wait_for .cache/refcmp_9000/FinalResult_ref.png
python tools/compare_reference.py --canvas 9000x4000 --flow_alg pixflow_low \
  --backend tpu --skip_ref --test_dir .cache/refcmp_9000 \
  > $L/h2h36_r5_low.log 2>&1

# 2. 36 MP head-to-head, fast preset (vs the same binary golden).
python tools/compare_reference.py --canvas 9000x4000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_9000 \
  > $L/h2h36_r5_fast.log 2>&1

# 3. 2250x1000 head-to-heads: low, fast, search_20.
wait_for .cache/refcmp_2250/FinalResult_ref.png
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5_low.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5_fast.log 2>&1
wait_for .cache/refcmp_2250_s20/FinalResult_ref.png
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_search_20 \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250_s20 \
  > $L/h2h_r5_s20.log 2>&1

# 4. Tiled (sharded) overhead on the hybrid path.
python tools/bench_tiled_overhead.py --canvas 2250x1000 --window \
  > $L/tiled_overhead_r5_2250.log 2>&1
python tools/bench_tiled_overhead.py --canvas 4500x2000 --window \
  > $L/tiled_overhead_r5_4500.log 2>&1

# 5. Headline-lever probe (w1_bf16 / tile variants, iters slope).
python tools/probe_r5_levers.py > $L/probe_r5_levers.log 2>&1

echo DONE > $L/r5_tpu_a.done
echo DONE
