#!/usr/bin/env python
"""Whole-level cost at scanned-tail shapes: how much of the headline is
the per-level FIXED term (ROADMAP r5 item 4b).  Times the fused level
body at representative 0.8-pyramid tail shapes for both presets."""
import sys

sys.path.insert(0, "/root/repo")

from panorama_opticalflow_tpu.utils.runtime import init_runtime  # noqa: E402

init_runtime(verbose=False)

from tools.bench_flow_level import whole_level  # noqa: E402
from panorama_opticalflow_tpu.utils.config import flow_params_by_name  # noqa: E402

params = flow_params_by_name("pixflow_low")
for (h, w) in [(655, 587), (335, 301), (168, 151), (86, 77), (44, 39)]:
    t = whole_level(h, w, params)
    print(f"level {h}x{w} ({h*w/1e6:.3f} MP): {t*1e3:7.2f} ms", flush=True)
