#!/bin/bash
cd /root/repo
python tools/probe_nan_r4.py 2000x2048 > artifacts/probe_nan_r4_b1_retry.log 2>&1
python tools/probe_nan_r4.py 2000x2048 --top > artifacts/probe_nan_r4_top.log 2>&1
echo done > artifacts/probe2.done
