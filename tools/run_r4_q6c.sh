#!/bin/bash
# Round-4 TPU queue 6c: final kernel parity record with the matmul
# remainder peel (the shipped default).
cd /root/repo
while [ ! -f artifacts/q6b.done ]; do sleep 30; done
python tools/check_pallas.py --warp > artifacts/check_warp_final.log 2>&1
echo done > artifacts/q6c.done
