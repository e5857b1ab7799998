#!/bin/bash
# Round-5 serial TPU batch B: overhead decomposition probes.
set -uo pipefail
cd /root/repo
L=artifacts
while [ ! -e $L/r5_tpu_a.done ]; do sleep 15; done
python tools/probe_hybrid_flow.py --canvas 4500x2000 > $L/probe_hybrid_flow_4500.log 2>&1
python tools/probe_flow_share.py > $L/probe_flow_share.log 2>&1
echo DONE > $L/r5_tpu_b.done
echo DONE
