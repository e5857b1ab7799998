#!/bin/bash
# Round-4 TPU queue 6e: localize the 4500 tiled-on-TPU divergence by
# stage (tiled jnp program vs untiled; CPU twin is clean at 0.99999).
cd /root/repo
while [ ! -f artifacts/q6d.done ]; do sleep 30; done
python tools/probe_tiled_stages.py --canvas 4500x2000 > artifacts/probe_tiled_stages_4500_r4.log 2>&1
echo done > artifacts/q6e.done
