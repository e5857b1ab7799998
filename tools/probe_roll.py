#!/usr/bin/env python
"""Probe pltpu.roll (dynamic rotate) semantics on this toolchain.

The warp kernel's roll-based remainder peel is bit-wrong on hardware
while exact in interpret mode (check_warp_roll.log).  This isolates the
primitive: roll a ramp array by a dynamic SMEM shift along each axis,
with negative and positive-equivalent shifts, and compare against
jnp.roll semantics.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

if "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv

H, W = 88, 512


def _kernel(axis, x_hbm, s_smem, o_ref, x_vmem, sem):
    c = pltpu.make_async_copy(x_hbm.at[:, :], x_vmem, sem)
    c.start()
    c.wait()
    o_ref[:, :] = pltpu.roll(x_vmem[:, :], s_smem[0], axis=axis)


def run(name, axis, shift):
    s = jnp.array([shift], jnp.int32)
    big = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    try:
        out = pl.pallas_call(
            functools.partial(_kernel, axis),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((H, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, W), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            interpret=INTERPRET,
        )(big, s)
        want = np.roll(np.asarray(big), shift, axis=axis)
        ok = np.array_equal(np.asarray(out), want)
        print(f"{name}: {'PASS' if ok else 'WRONG'}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"{name}: RAISED {type(e).__name__}: {str(e)[:150]}")
        return False


def main():
    print(f"backend={jax.default_backend()} interpret={INTERPRET}")
    run("lane    +77 ", 1, 77)
    run("lane    -77 ", 1, -77)
    run("lane  512-77", 1, W - 77)
    run("sublane +5  ", 0, 5)
    run("sublane -5  ", 0, -5)
    run("sublane 88-5", 0, H - 5)


if __name__ == "__main__":
    main()
