#!/usr/bin/env python
"""Bisect the residual Mosaic-in-shard_map miscompile by kernel class.

The standalone sharded solver is clean with all kernels on
(probe_nan_r4b_*.log) but the FULL windowed sharded stitch still
produces non-finite flow at production canvases
(tiled_overhead_r4_*.log).  This runs the windowed stitch at one canvas
under each TileConfig kernel-gate combination and reports the raw
non-finite count (no auto-fallback), isolating which kernel class
triggers the bug in the large program.

Usage: python tools/probe_bisect_shardmap.py [WxH] [config ...]
  configs: all, nowarp, nofused, norelax, onlywarp, onlyrelax, none
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

import dataclasses

from panorama_opticalflow_tpu.models import crop, stitcher
from panorama_opticalflow_tpu.parallel import tiled
from panorama_opticalflow_tpu.parallel.mesh import make_mesh
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.config import StitchConfig

CONFIGS = {
    "all": {},
    "nowarp": {"shardmap_warp_kernel": False},
    "nofused": {"shardmap_fused_blurs": False},
    "norelax": {"shardmap_relax_kernels": False},
    "onlywarp": {"shardmap_relax_kernels": False,
                 "shardmap_fused_blurs": False},
    "onlyrelax": {"shardmap_warp_kernel": False,
                  "shardmap_fused_blurs": False},
    "none": {"use_pallas_in_shardmap": False},
}


def main():
    args = [a for a in sys.argv[1:]]
    canvas = args[0] if args and "x" in args[0] else "2250x1000"
    w, h = (int(t) for t in canvas.split("x"))
    names = [a for a in args if a in CONFIGS] or \
        ["all", "nowarp", "nofused", "norelax"]

    photos, top = pio.synthesize_fisheye_set(h, w, n=5, seed=0,
                                             with_top=True)
    il, ir = jnp.asarray(photos[0]), jnp.asarray(top)
    cfg = StitchConfig(flow_alg="pixflow_low")
    mesh = make_mesh(1)
    n = 1
    window = crop.pair_window(stitcher.match_images(il, ir), cfg)
    roll, width = window[0], window[1]
    gsafe = bool(window[2]) if len(window) == 3 else False

    hp = -(-h // n) * n
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P
    sh = NamedSharding(mesh, P("y"))
    lp = jax.device_put(jnp.pad(il, ((0, hp - h), (0, 0), (0, 0))), sh)
    rp = jax.device_put(jnp.pad(ir, ((0, hp - h), (0, 0), (0, 0))), sh)

    base = tiled.TileConfig.for_params(cfg.flow_params)
    for name in names:
        tc = dataclasses.replace(base, **CONFIGS[name])
        fn = tiled._tiled_stitch_jit(mesh, "y", n, h, cfg, tc, width,
                                     gsafe, True)
        t0 = time.time()
        out, bad = fn(lp, rp, jnp.asarray(roll, jnp.int32))
        bad = int(bad)
        dt = time.time() - t0
        print(f"{name:10s}: nonfinite {bad:>9d}  wall {dt:6.1f}s  "
              f"{'CLEAN' if bad == 0 else 'MISCOMPILE'}", flush=True)


if __name__ == "__main__":
    main()
