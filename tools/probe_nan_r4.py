#!/usr/bin/env python
"""Round-4 probe for the axon Mosaic-in-shard_map miscompile.

Runs the tiled (shard_map) direction-batched flow solver on a 1-device
mesh with the Pallas kernels ENABLED (use_pallas_in_shardmap=True) at a
canvas size that reproduced 100% NaN flow in round 3, and compares
against the jnp-in-shard_map path (clean in r3).  The kernels module
reads PANOSTITCH_PALLAS_BARRIER (default 1) -- run once with 0 to
reproduce the bug, once with 1 to validate the optimization_barrier
workaround:

  PANOSTITCH_PALLAS_BARRIER=0 python tools/probe_nan_r4.py   # repro
  PANOSTITCH_PALLAS_BARRIER=1 python tools/probe_nan_r4.py   # fix?

Usage: probe_nan_r4.py [HxW] (default 2000x2048, the r3 NaN shape class)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

import dataclasses
from functools import partial

from jax.sharding import PartitionSpec as P
from jax import shard_map

from panorama_opticalflow_tpu.models import stitcher
from panorama_opticalflow_tpu.parallel import tiled
from panorama_opticalflow_tpu.parallel.mesh import make_mesh
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.config import StitchConfig


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = args[0] if args else "2000x2048"
    h, w = (int(t) for t in size.split("x"))
    use_top = "--top" in sys.argv
    print(f"canvas {h}x{w}  barrier="
          f"{os.environ.get('PANOSTITCH_PALLAS_BARRIER', '1')}"
          f"  data={'photo0+top' if use_top else 'n=2'}")

    if use_top:
        photos, top = pio.synthesize_fisheye_set(h, w, n=5, seed=0,
                                                 with_top=True)
        l, r = jnp.asarray(photos[0]), jnp.asarray(top)
    else:
        photos, _ = pio.synthesize_fisheye_set(h, w, n=2, seed=1,
                                               with_top=False)
        l, r = (jnp.asarray(p) for p in photos)
    cfg = StitchConfig(flow_alg="pixflow_low")
    params = cfg.flow_params
    cm = stitcher.match_images(l, r)
    ol = np.asarray(stitcher.extract_overlap(l, cm))
    orr = np.asarray(stitcher.extract_overlap(r, cm))

    mesh = make_mesh(1)
    n = 1

    def run(use_pallas, label):
        tc = tiled.TileConfig(use_pallas_in_shardmap=use_pallas)
        body = partial(tiled.tiled_compute_optical_flow_pair,
                       params=params, hints=("left", "right"), axis="y",
                       n=n, h_global=h, tc=tc)
        fn = jax.jit(shard_map(lambda a, b: body(a, b), mesh=mesh,
                               in_specs=(P("y"), P("y")),
                               out_specs=(P("y"), P("y")),
                               check_vma=False))
        t0 = time.time()
        flr, frl = fn(jnp.asarray(ol), jnp.asarray(orr))
        flr, frl = np.asarray(flr), np.asarray(frl)
        dt = time.time() - t0
        nan = int(np.isnan(flr).sum() + np.isnan(frl).sum())
        tot = flr.size + frl.size
        print(f"{label}: nan {nan} of {tot}  "
              f"absmax {np.nanmax(np.abs(flr)):.3f}  wall {dt:.1f}s")
        return flr, frl

    f_j, g_j = run(False, "jnp-in-shardmap   ")
    f_p, g_p = run(True, "pallas-in-shardmap")
    d = max(np.nanmax(np.abs(f_j - f_p)), np.nanmax(np.abs(g_j - g_p)))
    md = np.mean(np.abs(f_j - f_p))
    print(f"pallas vs jnp: maxdiff {d:.4f} meandiff {md:.6f}")
    ok = (not np.isnan(f_p).any()) and (not np.isnan(g_p).any())
    print("RESULT:", "CLEAN" if ok else "MISCOMPILE")


if __name__ == "__main__":
    main()
