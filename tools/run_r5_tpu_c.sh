#!/bin/bash
set -uo pipefail
cd /root/repo
L=artifacts
while [ ! -e $L/r5_tpu_b.done ]; do sleep 15; done
python tools/probe_tail_levels.py > $L/probe_tail_levels.log 2>&1
echo DONE > $L/r5_tpu_c.done
