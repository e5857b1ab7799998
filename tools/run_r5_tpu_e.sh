#!/bin/bash
set -uo pipefail
cd /root/repo
L=artifacts
python tools/probe_coarsest.py > $L/probe_coarsest.log 2>&1
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low_fast+stop24 \
  --backend tpu --skip_ref --test_dir .cache/refcmp_2250 \
  > $L/h2h_r5f_stop24.log 2>&1
echo DONE > $L/r5_tpu_e.done
