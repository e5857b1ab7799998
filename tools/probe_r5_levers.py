#!/usr/bin/env python
"""Round-5 headline-lever probe (ROADMAP item 4): device-time the whole
fused level and the relax kernel under config variants -- w1_bf16,
bigger relax tiles -- at the 36 MP headline's finest windowed shape and
one mid-pyramid shape, plus an iters-slope split of the relax kernel's
fixed-vs-variable cost."""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

import numpy as np
import jax.numpy as jnp

from tools.bench_micro import device_time
from tools.bench_flow_level import whole_level
from panorama_opticalflow_tpu.ops.pallas import kernels
from panorama_opticalflow_tpu.utils.config import flow_params_by_name


def relax_time(h, w, params, iters_k):
    rng = np.random.RandomState(0)
    mk = lambda s=0.1: jnp.asarray(
        rng.rand(2, h, w).astype(np.float32) * s)
    fx, fy, i0x, i0y, w1x, w1y, bfx, bfy = [mk(0.5) for _ in range(8)]
    mask = jnp.asarray((rng.rand(2, h, w) > 0.1).astype(np.float32))

    def run():
        return kernels.relax_phase_pallas(
            fx, fy, fx, fy, w1x, w1y, i0x, i0y, bfx, bfy, mask,
            params, iters_k, params.fast_window, tile=params.pallas_tile)

    return device_time(run, iters=6)


def main():
    base = flow_params_by_name("pixflow_low")
    variants = {
        "base": base,
        "w1bf16": dataclasses.replace(base, w1_bf16=True),
        "tile512": dataclasses.replace(base, pallas_tile=(64, 512)),
        "w1bf16+tile512": dataclasses.replace(
            base, w1_bf16=True, pallas_tile=(64, 512)),
        "w1bf16+tile128x512": dataclasses.replace(
            base, w1_bf16=True, pallas_tile=(128, 512)),
    }
    shapes = [(2000, 1792), (861, 771)]
    for name, p in variants.items():
        for (h, w) in shapes:
            try:
                t = whole_level(h, w, p)
                r3 = relax_time(h, w, p, 3)
                r9 = relax_time(h, w, p, 9)
                fixed = max(r3 - (r9 - r3) / 2.0, 0.0)
                print(f"{name:22s} {h}x{w}: whole {t*1e3:7.2f} ms  "
                      f"relax3 {r3*1e3:6.2f} relax9 {r9*1e3:6.2f} "
                      f"(fixed~{fixed*1e3:5.2f} ms, "
                      f"{(r9-r3)/6*1e3:5.2f} ms/iter)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:22s} {h}x{w}: FAILED {str(e)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()
