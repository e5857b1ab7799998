#!/bin/bash
cd /root/repo
while [ ! -f artifacts/q6d.done ]; do sleep 20; done
REF=/tmp/refcmp_hua5gvpz/FinalResult_ref.png
python tools/probe_h2h_bisect.py noshift $REF > artifacts/h2h_noshift.log 2>&1
echo done > artifacts/q6d2.done
