#!/bin/bash
# Round-4 TPU queue 6d (reworked): bisect the TPU head-to-head
# regression (black top band) at 2250x1000 against the cached binary
# output.  Ordered by diagnostic value.
cd /root/repo
while [ ! -f artifacts/q6c.done ]; do sleep 20; done
REF=/tmp/refcmp_hua5gvpz/FinalResult_ref.png
PANOSTITCH_PALLAS_BARRIER=0 python tools/probe_h2h_bisect.py barrier0 $REF > artifacts/h2h_barrier0.log 2>&1
python tools/probe_h2h_bisect.py nowarpk $REF > artifacts/h2h_nowarpk.log 2>&1
python tools/probe_h2h_bisect.py nokernels $REF > artifacts/h2h_nokernels.log 2>&1
python tools/probe_h2h_bisect.py default $REF > artifacts/h2h_default.log 2>&1
echo done > artifacts/q6d.done
