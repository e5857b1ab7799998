#!/bin/bash
cd /root/repo
while [ ! -f artifacts/q6e.done ]; do sleep 30; done
python tools/probe_bisect_shardmap.py 2250x1000 onlywarp onlyrelax > artifacts/bisect_shardmap_2250b.log 2>&1
echo done > artifacts/q6f.done
