#!/bin/bash
set -uo pipefail
cd /root/repo
L=artifacts
while [ ! -e $L/r5_tpu_f.done ]; do sleep 15; done
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast+cph2 \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5h_cph2.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast+cph1 \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5h_cph1.log 2>&1
python tools/probe_flow_share.py > $L/probe_flow_share_g.log 2>&1
echo DONE > $L/r5_tpu_g.done
