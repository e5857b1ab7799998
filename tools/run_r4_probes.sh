#!/bin/bash
# Round-4 TPU queue 1: validate the barrier workaround for the
# Mosaic-in-shard_map miscompile at the r3 NaN shape classes.
cd /root/repo
python tools/probe_nan_r4.py 2000x2048 > artifacts/probe_nan_r4_pair.log 2>&1
python tools/probe_nan_r4.py 2000x2048 --top > artifacts/probe_nan_r4_top.log 2>&1
echo done > artifacts/probes1.done
