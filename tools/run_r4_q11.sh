#!/bin/bash
cd /root/repo
python tools/fidelity_36mp.py run nowarpk > artifacts/fid_nowarpk_r4c.log 2>&1
python tools/fidelity_36mp.py compare production nowarpk > artifacts/fid_nowarpk_cmp_r4c.log 2>&1
python tools/bench_flow_level.py > artifacts/flowlevel_r4_final.log 2>&1
echo done > artifacts/q11.done
