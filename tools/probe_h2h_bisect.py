#!/usr/bin/env python
"""Bisect the TPU head-to-head regression (black top band, SSIM 0.416
vs the reference binary at 2250x1000 windowed, compare_ref_r4.log).

Runs OUR stitch_six on TPU at 2250x1000 under one config and compares
against the cached reference PNG.  Configs:
  default    shipping configuration
  barrier0   PANOSTITCH_PALLAS_BARRIER=0 must be set in the env (the
             r4 fence off -- r3's validated configuration)
  nowarpk    warp kernel off (XLA block-gather warp)
  nokernels  all Pallas kernels off (pure XLA on TPU)

Usage: probe_h2h_bisect.py <config> <ref_png>
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses

knob = sys.argv[1]
ref_png = sys.argv[2]

from panorama_opticalflow_tpu.utils import config as cfgmod

if knob in ("nowarpk", "nokernels", "noshift"):
    orig = cfgmod.flow_params_by_name

    def patched(name):
        p = orig(name)
        if knob == "nokernels":
            return dataclasses.replace(p, use_pallas=False)
        if knob == "noshift":
            # the shift warp was deleted in r5; the knob is now a no-op
            return p
        return dataclasses.replace(p, warp_pallas=False)

    cfgmod.flow_params_by_name = patched

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

import jax.numpy as jnp
from PIL import Image

from panorama_opticalflow_tpu.models import pipeline
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.metrics import ssim

w, h = 2250, 1000
photos, top = pio.synthesize_fisheye_set(h, w, n=5, seed=0)
cfg = cfgmod.StitchConfig(flow_alg="pixflow_low")
t0 = time.time()
out = np.asarray(pipeline.stitch_six([jnp.asarray(p) for p in photos],
                                     jnp.asarray(top), cfg))
dt = time.time() - t0
ref = np.asarray(Image.open(ref_png))
s = ssim(out[..., :3].astype(np.float32), ref[..., :3].astype(np.float32))
band = out[:h // 5, :, :3].astype(np.float32)
import os
print(f"{knob} (barrier={os.environ.get('PANOSTITCH_PALLAS_BARRIER', '1')}):"
      f" SSIM vs binary {s:.4f}  top-band rgb mean {band.mean():.1f}"
      f"  wall {dt:.0f}s")
