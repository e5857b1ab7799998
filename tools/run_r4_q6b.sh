#!/bin/bash
# Round-4 TPU queue 6b: batched re-run after the SMEM flatten fix +
# reference-binary head-to-head refresh with the final kernel.
cd /root/repo
while [ ! -f artifacts/q6.done ]; do sleep 30; done
python tools/bench_batched.py --canvas 2250x1000 --batch 16 --device > artifacts/bench_r4_batched16b.log 2>&1
python tools/compare_reference.py --backend tpu --flow_alg pixflow_low > artifacts/compare_ref_r4.log 2>&1
python tools/compare_reference.py --backend tpu --flow_alg pixflow_low_fast > artifacts/compare_ref_r4_fast.log 2>&1
python bench.py > artifacts/bench_r4_headline3.log 2>&1
echo done > artifacts/q6b.done
