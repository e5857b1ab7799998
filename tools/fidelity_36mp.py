#!/usr/bin/env python
"""36 MP fidelity self-consistency harness (VERDICT r2 item 3).

The reference binary segfaults at 9000x4000 (unchecked Mat::at reads,
CPU/StitchTool.cpp:78-88), so the production fast-path approximations are
validated at full scale against THIS framework's own exact/conservative
settings, one knob at a time.  Each knob runs in its own process (one TPU
process at a time; jit statics can't see monkeypatches):

  production    default stitch_six (windowed, fused kernels, 1x3 schedule,
                tiled samplers)
  nowindow      use_crop=False: full-canvas flow/blend/combine/gather
  exact_combine tiled combine sampler replaced by the exact XLA gather
  sched22       2-phase x 2-iter relaxation schedule (unfused by
                construction: the bf target is recomputed per phase)
  unfused       fuse_level_blurs=False: round-2's separate XLA blur
                round trips (isolates the round-3 fused kernels)

Usage:
  python tools/fidelity_36mp.py run <knob> [--canvas WxH]   # writes .npy
  python tools/fidelity_36mp.py compare <knob_a> <knob_b> [--canvas WxH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT_DIR = "/root/repo/fidelity36"


def run_knob(knob: str, w: int, h: int) -> None:
    from panorama_opticalflow_tpu.utils.runtime import init_runtime

    init_runtime(verbose=False)

    import dataclasses

    import jax
    import numpy as np

    from panorama_opticalflow_tpu.models import novel_view, pipeline
    from panorama_opticalflow_tpu.utils import config as cfgmod
    from panorama_opticalflow_tpu.utils import io as pio

    use_crop = True
    flow_alg = "pixflow_low"
    if knob == "production":
        pass
    elif knob == "fastpreset":
        flow_alg = "pixflow_low_fast"
    elif knob == "nowindow":
        use_crop = False
    elif knob == "search20":
        # per-preset self-consistency rows (VERDICT r3 item 6): each
        # bench-reported preset gets its own production-vs-conservative
        # pair at full scale
        flow_alg = "pixflow_search_20"
    elif knob == "search20_nowindow":
        flow_alg = "pixflow_search_20"
        use_crop = False
    elif knob == "fast_nowindow":
        flow_alg = "pixflow_low_fast"
        use_crop = False
    elif knob in ("fast_nowindow_nok", "fast_nowindow_nowarpk"):
        # bisect the r4 nowindow-at-36MP blackout (black top band =
        # NaN->uint8-zero signature) by kernel class: all Pallas
        # kernels off, or just the warp kernel off
        flow_alg = "pixflow_low_fast"
        use_crop = False
        orig2 = cfgmod.flow_params_by_name

        def patched2(name, _k=knob):
            p = orig2(name)
            if _k == "fast_nowindow_nok":
                return dataclasses.replace(p, use_pallas=False)
            return dataclasses.replace(p, warp_pallas=False)

        cfgmod.flow_params_by_name = patched2
    elif knob == "exact_combine":
        novel_view.TILED_SAMPLER_MIN_H = 10 ** 9
        novel_view.TILED_SAMPLER_MIN_W = 10 ** 9
    elif knob in ("sched22", "unfused", "nowarpk", "fast_nowarpk"):
        orig = cfgmod.flow_params_by_name

        def patched(name):
            p = orig(name)
            if knob == "sched22":
                return dataclasses.replace(p, relax_phases=2,
                                           relax_iters_per_phase=2)
            if knob in ("nowarpk", "fast_nowarpk"):
                # isolate the r4 Pallas warp kernel: XLA block-gather
                # warp instead (the r3 production path)
                return dataclasses.replace(p, warp_pallas=False)
            return dataclasses.replace(p, fuse_level_blurs=False)

        cfgmod.flow_params_by_name = patched
        if knob == "fast_nowarpk":
            flow_alg = "pixflow_low_fast"
    else:
        raise SystemExit(f"unknown knob {knob}")

    cfg = cfgmod.StitchConfig(flow_alg=flow_alg)
    photos_np, top_np = pio.synthesize_fisheye_set(h, w, n=5, seed=0)
    dev = jax.devices()[0]
    photos = [jax.device_put(p, dev) for p in photos_np]
    top = jax.device_put(top_np, dev)

    t0 = time.time()
    out = pipeline.stitch_six(photos, top, cfg, use_crop=use_crop)
    out_np = np.asarray(out)
    total = time.time() - t0

    os.makedirs(OUT_DIR, exist_ok=True)
    np.save(os.path.join(OUT_DIR, f"{knob}_{w}x{h}.npy"), out_np)
    print(json.dumps({"knob": knob, "canvas": f"{w}x{h}",
                      "wall_s_incl_compile": round(total, 1)}))


def compare(a: str, b: str, w: int, h: int) -> None:
    import numpy as np

    from panorama_opticalflow_tpu.utils.metrics import ssim

    xa = np.load(os.path.join(OUT_DIR, f"{a}_{w}x{h}.npy"))
    xb = np.load(os.path.join(OUT_DIR, f"{b}_{w}x{h}.npy"))
    s = ssim(xa[..., :3].astype(np.float32), xb[..., :3].astype(np.float32))
    same = float((xa == xb).mean())
    print(json.dumps({"compare": f"{a} vs {b}", "canvas": f"{w}x{h}",
                      "ssim_rgb": round(float(s), 5),
                      "bit_same_frac": round(same, 5)}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["run", "compare"])
    ap.add_argument("knobs", nargs="+")
    ap.add_argument("--canvas", default="9000x4000")
    args = ap.parse_args()
    w, h = (int(t) for t in args.canvas.split("x"))
    if args.cmd == "run":
        run_knob(args.knobs[0], w, h)
    else:
        compare(args.knobs[0], args.knobs[1], w, h)
    return 0


if __name__ == "__main__":
    sys.exit(main())
