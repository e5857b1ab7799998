#!/usr/bin/env python
"""True DEVICE latency of the fused 6-photo chain (tunnel-independent):
wraps the scanned chain program in a device-side fori_loop
(bench_micro.device_time), so per-dispatch RPC and fetch latency drop
out.  Compares against the wall-clock bench.py number to quantify the
tunnel overhead term.

Usage: python tools/bench_chain_device.py [--canvas WxH] [--iters N]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", default="9000x4000")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--flow_alg", default="pixflow_low")
    args = ap.parse_args()
    w, h = (int(t) for t in args.canvas.split("x"))

    from panorama_opticalflow_tpu.utils.runtime import init_runtime

    init_runtime(verbose=False)

    import jax
    import jax.numpy as jnp

    from tools.bench_micro import device_time
    from panorama_opticalflow_tpu.models import crop, pipeline
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig

    cfg = StitchConfig(flow_alg=args.flow_alg)
    photos_np, top_np = pio.synthesize_fisheye_set(h, w, n=5, seed=0)
    dev = jax.devices()[0]
    photos = jax.device_put(jnp.stack([jnp.asarray(p) for p in photos_np]),
                            dev)
    top = jax.device_put(jnp.asarray(top_np), dev)
    windows = crop.plan_chain_windows(list(photos_np), top_np, cfg)
    widths = {wd for _, wd, _ in windows}
    assert len(widths) == 1 and min(widths) < w, windows
    width = next(iter(widths))
    rolls = jnp.asarray([r for r, _, _ in windows], jnp.int32)
    gsafes = jnp.asarray([g for _, _, g in windows], bool)

    t = device_time(
        lambda p, tp, rl, gs: pipeline._chain_windowed_jit(
            p, tp, rl, gs, width, cfg),
        photos, top, rolls, gsafes, iters=args.iters)
    mp = h * w / 1e6
    print(json.dumps({
        "metric": f"6-photo {w}x{h} chain DEVICE latency "
                  f"({args.flow_alg}, {dev.platform})",
        "value": round(t, 4),
        "unit": "s",
        "mp_per_s": round(5 * mp / t, 1),
        "iters": args.iters,
        "device": str(dev),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
