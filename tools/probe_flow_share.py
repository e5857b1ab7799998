#!/usr/bin/env python
"""How much of the 36 MP headline is the flow solve?  Device-times ONE
windowed flow pair (models/pixflow.compute_optical_flow_pair) at the
headline window shape (4000 x 3584 overlap columns -> 2000x1792 finest
flow level after the 0.5 downscale) for the production and parity
presets.  headline e2e ~= 5 * flow_pair + stitch machinery, so this
pins the flow/stitch split that the per-level probes only extrapolate.

Usage: python tools/probe_flow_share.py [--shape WxH] [--algs a,b]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="3584x4000",
                    help="overlap window WxH fed to the flow solver")
    ap.add_argument("--algs", default="pixflow_low_fast,pixflow_low")
    args = ap.parse_args()
    w, h = (int(t) for t in args.shape.split("x"))

    from panorama_opticalflow_tpu.utils.runtime import init_runtime

    init_runtime(verbose=False)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.bench_micro import device_time
    from panorama_opticalflow_tpu.models import pixflow
    from panorama_opticalflow_tpu.utils.config import flow_params_by_name

    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (h // 50 + 2, w // 50 + 2, 4), np.uint8)
    import cv2  # smooth natural-ish content; alpha mostly opaque

    up = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    up[..., 3] = 255
    a = jax.device_put(jnp.asarray(up))
    b = jax.device_put(jnp.asarray(np.roll(up, 7, axis=1)))

    for alg in args.algs.split(","):
        params = flow_params_by_name(alg)
        fn = jax.jit(lambda x, y, p=params: jnp.concatenate(
            pixflow.compute_optical_flow_pair(x, y, p, "left", "right"),
            -1))
        t = device_time(lambda x, y: fn(x, y), a, b, iters=3)
        print(f"flow pair {alg:18s} {w}x{h}: {t*1e3:9.2f} ms "
              f"(x5 pairs = {t*5:6.3f} s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
