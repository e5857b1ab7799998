#!/usr/bin/env python
"""Probe Mosaic support for dynamic-offset HBM->VMEM DMA on this toolchain.

The planned Pallas warp kernel (fold the per-tile block gather of
ops/relax_fast.warp_by_flow_tiled into a kernel) needs each grid tile to
DMA its input window at a runtime offset (the tile's rounded mean flow).
This probes, at toy scale:

  A. dynamic ROW start, 8-aligned
  B. dynamic ROW start, unaligned
  C. dynamic COL start, 128-aligned
  D. dynamic COL start, unaligned
  E. rows+cols both dynamic and unaligned

Each case DMAs a window of a known ramp array at an offset read from an
SMEM operand and compares against the numpy slice.  Run with
--interpret for the CPU semantics check; on TPU it reports
PASS/FAIL/crash per case.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv or "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv

TH, TW = 16, 256  # window shape (aligned)


def _kernel(x_hbm, off_smem, o_ref, x_vmem, sem, hinted=False):
    oy = off_smem[0]
    ox = off_smem[1]
    if hinted:
        # floor to the (8, 128) tiling and assert it to the compiler --
        # the only dynamic-start form Mosaic accepts on this toolchain
        oy = pl.multiple_of(oy - jax.lax.rem(oy, 8), 8)
        ox = pl.multiple_of(ox - jax.lax.rem(ox, 128), 128)
    c = pltpu.make_async_copy(
        x_hbm.at[pl.ds(oy, TH), pl.ds(ox, TW)], x_vmem, sem)
    c.start()
    c.wait()
    o_ref[:, :] = x_vmem[:, :]


def run_case(name, oy, ox, big, hinted=False):
    import functools
    off = jnp.array([oy, ox], jnp.int32)
    try:
        out = pl.pallas_call(
            functools.partial(_kernel, hinted=hinted),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((TH, TW), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TH, TW), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            interpret=INTERPRET,
        )(big, off)
        out = np.asarray(out)
        if hinted:
            oy, ox = oy - oy % 8, ox - ox % 128
        want = np.asarray(big)[oy:oy + TH, ox:ox + TW]
        ok = np.array_equal(out, want)
        print(f"{name}: {'PASS' if ok else 'WRONG (maxdiff %g)' % np.abs(out - want).max()}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"{name}: RAISED {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    h, w = 256, 1024
    big = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
    print(f"backend={jax.default_backend()} interpret={INTERPRET}")
    run_case("A row8      (oy=64, ox=0)  ", 64, 0, big)
    run_case("B row-unal  (oy=37, ox=0)  ", 37, 0, big)
    run_case("C col128    (oy=0,  ox=256)", 0, 256, big)
    run_case("D col-unal  (oy=0,  ox=75) ", 0, 75, big)
    run_case("E both-unal (oy=13, ox=419)", 13, 419, big)
    run_case("F hinted    (oy=64, ox=256)", 64, 256, big, hinted=True)
    run_case("G hinted-flr(oy=37, ox=419)", 37, 419, big, hinted=True)


if __name__ == "__main__":
    main()
