#!/usr/bin/env python
"""Per-stage timing + fidelity probe of the sharded (1-device-mesh)
stitch on TPU: which tiled stage eats the 45 s at 2.2 MP, and which
diverges from the untiled program (SSIM 0.915 mystery).

Usage: python tools/probe_tiled_stages.py [--canvas WxH]
"""

import argparse
import json
import sys
from functools import partial

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", default="2250x1000")
    args = ap.parse_args()
    w, h = (int(t) for t in args.canvas.split("x"))

    from panorama_opticalflow_tpu.utils.runtime import init_runtime

    init_runtime(verbose=False)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from tools.bench_micro import device_time
    from panorama_opticalflow_tpu.models import crop, novel_view, stitcher
    from panorama_opticalflow_tpu.models import pixflow
    from panorama_opticalflow_tpu.ops import image as im
    from panorama_opticalflow_tpu.parallel import tiled
    from panorama_opticalflow_tpu.parallel.mesh import make_mesh
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig
    from panorama_opticalflow_tpu.utils.metrics import ssim, endpoint_error

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

    window = crop.pair_window(np.asarray(stitcher.match_images(il, ir)),
                              cfg)
    roll, width, gsafe = window
    print(f"# window: {window}", flush=True)

    canvas_map = stitcher.match_images(il, ir)
    ol = stitcher.extract_overlap(il, canvas_map)
    orr = stitcher.extract_overlap(ir, canvas_map)
    roll_j = jnp.asarray(roll, jnp.int32)

    def win(a):
        return jnp.roll(a, -roll_j, axis=1)[:, :width]

    ol_w = jax.device_put(np.asarray(win(ol)), dev)
    orr_w = jax.device_put(np.asarray(win(orr)), dev)
    map_w = jax.device_put(np.asarray(win(canvas_map)), dev)

    sh = NamedSharding(mesh, P(axis))

    def shard1(fn, *arrs, extra=()):
        f = shard_map(fn, mesh=mesh,
                      in_specs=tuple(P(axis) for _ in arrs),
                      out_specs=P(axis), check_vma=False)
        return jax.jit(f), [jax.device_put(a, sh) for a in arrs]

    # ---- tiled blend (windowed) on the mesh ----
    fn, arrs = shard1(
        lambda m: tiled._tiled_generate_blend(m, cfg, axis, n, h,
                                              window=(roll, width))[0],
        np.asarray(map_w))
    t = device_time(lambda m: fn(m), *arrs, iters=3)
    print(f"tiled blend windowed:   {t*1e3:9.2f} ms", flush=True)

    # untiled blend reference
    t = device_time(lambda m: stitcher.generate_blend(
        m, cfg, window=(roll_j, width))[0], canvas_map, iters=3)
    print(f"untiled blend windowed: {t*1e3:9.2f} ms", flush=True)

    # ---- tiled flow pair (windowed) on the mesh ----
    fn, arrs = shard1(
        lambda a, b: jnp.concatenate(
            tiled.tiled_compute_optical_flow_pair(
                a, b, params, ("left", "right"), axis, n, h, tc), -1),
        np.asarray(ol_w), np.asarray(orr_w))
    t = device_time(lambda a, b: fn(a, b), *arrs, iters=3)
    print(f"tiled flow windowed:    {t*1e3:9.2f} ms", flush=True)
    fl_t = np.asarray(fn(*arrs))

    # untiled flow reference
    t = device_time(lambda a, b: jnp.concatenate(
        pixflow.compute_optical_flow_pair(a, b, params, "left", "right"),
        -1), ol_w, orr_w, iters=3)
    print(f"untiled flow windowed:  {t*1e3:9.2f} ms", flush=True)
    fl_u = np.asarray(jnp.concatenate(pixflow.compute_optical_flow_pair(
        ol_w, orr_w, params, "left", "right"), -1))
    epe1 = endpoint_error(fl_t[..., :2], fl_u[..., :2])
    epe2 = endpoint_error(fl_t[..., 2:], fl_u[..., 2:])
    print(f"flow tiled-vs-untiled EPE: {epe1:.4f} / {epe2:.4f}",
          flush=True)

    # ---- combine ----
    blend_w = stitcher.generate_blend(canvas_map, cfg,
                                      window=(roll_j, width))[0]
    fn, arrs = shard1(
        lambda a, b, f1, f2, bl: tiled._tiled_combine(
            a, b, f1, f2, bl, axis, tc),
        np.asarray(ol_w), np.asarray(orr_w),
        fl_u[..., :2], fl_u[..., 2:], np.asarray(blend_w))
    t = device_time(lambda *a: fn(*a), *arrs, iters=3)
    print(f"tiled combine windowed: {t*1e3:9.2f} ms", flush=True)
    m_t = np.asarray(fn(*arrs))
    m_u = np.asarray(novel_view.combine_novel_views(
        ol_w, orr_w, jnp.asarray(fl_u[..., :2]), jnp.asarray(fl_u[..., 2:]),
        blend_w))
    print(f"combine tiled-vs-untiled SSIM: "
          f"{ssim(m_t, m_u):.5f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
