#!/bin/bash
cd /root/repo
PANOSTITCH_PALLAS_BARRIER=0 python tools/probe_nan_r4.py > artifacts/probe_nan_r4_b0.log 2>&1
PANOSTITCH_PALLAS_BARRIER=1 python tools/probe_nan_r4.py > artifacts/probe_nan_r4_b1.log 2>&1
echo done > artifacts/probe1.done
