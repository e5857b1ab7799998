#!/usr/bin/env python
"""Decompose the round-5 tiled-vs-untiled overhead (+42% at 2250/4500
windowed, tiled_overhead_r5_*.log) on the 1-device mesh: time the
hybrid flow solve (parallel/hybrid.hybrid_flow_pair) against the
untiled solver (models/pixflow.compute_optical_flow_pair) on identical
windowed inputs, plus the pre/post shard_map segments, all
device-timed (device-side loop; the tunnel's ~40-100 ms dispatch RPC
would otherwise swamp sub-100 ms stages).

Usage: python tools/probe_hybrid_flow.py [--canvas WxH]
"""

import argparse
import sys
from functools import partial

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", default="4500x2000")
    args = ap.parse_args()
    w, h = (int(t) for t in args.canvas.split("x"))

    from panorama_opticalflow_tpu.utils.runtime import init_runtime

    init_runtime(verbose=False)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tools.bench_micro import device_time
    from panorama_opticalflow_tpu.models import crop, pixflow, stitcher
    from panorama_opticalflow_tpu.parallel import hybrid, tiled
    from panorama_opticalflow_tpu.parallel.mesh import make_mesh
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig

    cfg = StitchConfig(flow_alg="pixflow_low")
    params = cfg.flow_params
    dev = jax.devices()[0]
    photos, top = pio.synthesize_fisheye_set(h, w, n=5, seed=0,
                                             with_top=True)
    il = jax.device_put(photos[0], dev)
    ir = jax.device_put(top, dev)
    tc = tiled.TileConfig.for_params(params)
    mesh = make_mesh(1)
    axis = "y"
    n = 1
    sh = NamedSharding(mesh, P(axis))

    window = crop.pair_window(np.asarray(stitcher.match_images(il, ir)),
                              cfg)
    roll, width, gsafe = window
    print(f"# window: {window}", flush=True)

    # pre segment alone gives the exact flow inputs the full program uses
    pre = jax.jit(jax.shard_map(
        partial(tiled._pre_flow_body, cfg=cfg, axis=axis, n=n,
                h_global=h, width=width),
        mesh=mesh, in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False))
    roll_j = jnp.asarray(roll, jnp.int32)
    ils, irs = jax.device_put(il, sh), jax.device_put(ir, sh)
    t = device_time(lambda a, b: pre(a, b, roll_j)[0], ils, irs, iters=3)
    print(f"pre segment:        {t*1e3:9.2f} ms", flush=True)
    fl, fr, blend = pre(ils, irs, roll_j)
    fl_np, fr_np = np.asarray(fl), np.asarray(fr)

    # ---- hybrid flow on the mesh ----
    def hyb(a, b):
        f01, f10 = hybrid.hybrid_flow_pair(
            a, b, params, ("left", "right"), mesh, axis, n, h, tc)
        return jnp.concatenate([f01, f10], -1)

    hyb_j = jax.jit(hyb)
    a_sh = jax.device_put(fl_np, sh)
    b_sh = jax.device_put(fr_np, sh)
    t = device_time(lambda a, b: hyb_j(a, b), a_sh, b_sh, iters=3)
    print(f"hybrid flow:        {t*1e3:9.2f} ms", flush=True)

    # ---- untiled flow on the same inputs ----
    unt = jax.jit(lambda a, b: jnp.concatenate(
        pixflow.compute_optical_flow_pair(a, b, params, "left", "right"),
        -1))
    a_d = jax.device_put(fl_np, dev)
    b_d = jax.device_put(fr_np, dev)
    t = device_time(lambda a, b: unt(a, b), a_d, b_d, iters=3)
    print(f"untiled flow:       {t*1e3:9.2f} ms", flush=True)

    # ---- post segment ----
    fl4 = np.asarray(hyb_j(a_sh, b_sh))
    post = jax.jit(jax.shard_map(
        partial(tiled._post_flow_body, cfg=cfg, axis=axis, h_global=h,
                tc=tc, width=width, gather_windowed=gsafe),
        mesh=mesh, in_specs=(P(axis),) * 7 + (P(),),
        out_specs=P(axis), check_vma=False))
    args_post = [ils, irs, a_sh, b_sh,
                 jax.device_put(fl4[..., :2], sh),
                 jax.device_put(fl4[..., 2:], sh),
                 jax.device_put(np.asarray(blend), sh)]
    t = device_time(lambda *a: post(*a, roll_j), *args_post, iters=3)
    print(f"post segment:       {t*1e3:9.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
