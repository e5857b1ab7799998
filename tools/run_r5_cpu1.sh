#!/bin/bash
# Round-5 CPU batch: reference-binary golden outputs that the TPU
# head-to-heads compare against (VERDICT r4 item 2).  Runs the
# reference binary ONLY (--skip_ours) so it can overlap the TPU
# bench's compile phase without touching the device.
set -uo pipefail
cd /root/repo
L=artifacts

# 36 MP golden: the reference binary at the full headline canvas.
python tools/compare_reference.py --canvas 9000x4000 --flow_alg pixflow_low \
  --skip_ours --test_dir .cache/refcmp_9000 > $L/ref_36mp_r5.log 2>&1

# search_20 golden at 2250x1000 (no binary h2h existed at any size).
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_search_20 \
  --skip_ours --test_dir .cache/refcmp_2250_s20 > $L/ref_s20_r5.log 2>&1

# 2250x1000 goldens for the low/fast h2h (inputs + FinalResult_ref).
python tools/compare_reference.py --canvas 2250x1000 --flow_alg pixflow_low \
  --skip_ours --test_dir .cache/refcmp_2250 > $L/ref_low2250_r5.log 2>&1

echo DONE
