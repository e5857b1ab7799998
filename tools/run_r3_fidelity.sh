#!/bin/bash
cd /root/repo
echo "=== check_pallas --fused $(date)"
timeout 1800 python tools/check_pallas.py --fused > check_fused_r3.log 2>&1
echo "=== fidelity production $(date)"
python tools/fidelity_36mp.py run production > fid_production.log 2>&1
echo "=== fidelity unfused $(date)"
python tools/fidelity_36mp.py run unfused > fid_unfused.log 2>&1
echo "=== fidelity exact_combine $(date)"
python tools/fidelity_36mp.py run exact_combine > fid_exact_combine.log 2>&1
echo "=== fidelity nowindow $(date)"
python tools/fidelity_36mp.py run nowindow > fid_nowindow.log 2>&1
echo "=== fidelity sched22 $(date)"
python tools/fidelity_36mp.py run sched22 > fid_sched22.log 2>&1
echo "=== done $(date)"
