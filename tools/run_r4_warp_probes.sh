#!/bin/bash
# Round-4 TPU queue 2: validate the aligned-dynamic-DMA warp kernel.
cd /root/repo
python tools/probe_dyndma.py > artifacts/probe_dyndma.log 2>&1
python tools/check_pallas.py --warp > artifacts/check_warp_roll.log 2>&1
PANOSTITCH_WARP_XSHIFT=matmul python tools/check_pallas.py --warp > artifacts/check_warp_matmul.log 2>&1
echo done > artifacts/warp_probes.done
