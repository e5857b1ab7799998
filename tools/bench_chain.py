#!/usr/bin/env python
"""Per-stage timing of the ACTUAL bench chain (stitch_six auto path):
for each pair, time the four cache-warm jit programs (geometry, blend
window, flows window, finish) with a forced 4-byte fetch after each.

Per-stage fetches serialize the chain and add one tunnel RPC
(~40-100 ms) per stage, so absolute numbers are inflated; relative
stage weights are what this tool is for.

Usage: python tools/bench_chain.py [WxH] [alg]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from panorama_opticalflow_tpu.utils.runtime import init_runtime  # noqa: E402

init_runtime(verbose=False)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from panorama_opticalflow_tpu.models import crop, pipeline  # noqa: E402
from panorama_opticalflow_tpu.utils import io as pio  # noqa: E402
from panorama_opticalflow_tpu.utils.config import StitchConfig  # noqa: E402


def force(x):
    return np.asarray(x[:1, :1, :1] if x.ndim == 3 else x[:1, :1])


def main():
    w, h = (int(t) for t in (sys.argv[1] if len(sys.argv) > 1
                             else "2250x1000").split("x"))
    alg = sys.argv[2] if len(sys.argv) > 2 else "pixflow_low"
    cfg = StitchConfig(flow_alg=alg)

    photos_np, top_np = pio.synthesize_fisheye_set(h, w, n=5, seed=0)
    dev = jax.devices()[0]
    photos = [jax.device_put(p, dev) for p in photos_np]
    top = jax.device_put(top_np, dev)

    # warm every program once
    t0 = time.time()
    out = pipeline.stitch_six(photos, top, cfg)
    force(out)
    print(f"# warm end-to-end (incl compile): {time.time() - t0:.2f} s")
    t0 = time.time()
    out = pipeline.stitch_six(photos, top, cfg)
    force(out)
    print(f"# warm end-to-end: {time.time() - t0:.3f} s")

    windows = crop.plan_chain_windows(photos, top, cfg)
    totals = {}
    result = top
    t_all = time.time()
    for i, (image_l, window) in enumerate(zip(photos, windows), 1):
        roll, width, gsafe = window
        roll_j = jnp.asarray(roll)
        stages = []

        t0 = time.time()
        canvas_map, ol, orr = pipeline._geometry_jit(image_l, result, cfg)
        force(canvas_map)
        stages.append(("geometry", time.time() - t0))

        t0 = time.time()
        blend_w = pipeline._blend_window_jit(canvas_map, roll_j, width, cfg)
        force(blend_w)
        stages.append(("blend", time.time() - t0))

        t0 = time.time()
        flow_lr_w, flow_rl_w = pipeline._flows_window_jit(
            ol, orr, roll_j, width, cfg)
        force(flow_lr_w)
        stages.append(("flows", time.time() - t0))

        t0 = time.time()
        result = pipeline._finish_windowed_jit(
            canvas_map, ol, orr, blend_w, image_l, result,
            flow_lr_w, flow_rl_w, roll_j, width, cfg, gather_windowed=gsafe)
        force(result)
        stages.append(("finish", time.time() - t0))

        line = " ".join(f"{k}={v*1e3:7.1f}ms" for k, v in stages)
        print(f"pair {i} (width {width}, gsafe {int(gsafe)}): {line}")
        for k, v in stages:
            totals[k] = totals.get(k, 0.0) + v
    print(f"# staged end-to-end: {time.time() - t_all:.3f} s "
          f"(serialization-inflated)")
    tot = sum(totals.values())
    for k, v in totals.items():
        print(f"total {k:9s} {v:6.3f} s  ({100 * v / tot:4.1f}%)")


if __name__ == "__main__":
    main()
