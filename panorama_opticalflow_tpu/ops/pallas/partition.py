"""Batch-dim partitioning wrappers for the Pallas kernels.

Round-5 restructure (ROADMAP item 2): the sharded stitch used to call
the Pallas kernels *inside* its shard_map body, where the axon-v5e
toolchain miscompiles Mosaic custom-calls embedded in large
manual-sharding programs (r3/r4 probes; the optimization_barrier fence
in kernels.py fixed the standalone solver but not the full stitch).
The structural fix: the sharded pipeline keeps only halo exchanges,
resizes and collectives in (tiny) shard_map bodies, and invokes the
kernels *between* them on row-stacked tile batches under ordinary
GSPMD/Shardy partitioning.  These wrappers make each kernel entry a
``jax.experimental.custom_partitioning`` op that partitions trivially
over its leading batch (= tile) dimension, so the partitioned module
contains the Mosaic custom-call with no manual-sharding wrappers around
it -- the same shape as the proven-clean single-chip program.

Every kernel operand/result here carries the tile batch as dim 0 and
per-device batch counts stay integral (the tiled solver always passes
multiples of the mesh size).  The GPU-dispatch analogue in the
reference is the device-count scan + kernel-vs-CPU fallback
(GPU/OpticalFlow.cpp:132-155); here the dispatch decision is a static
partitioning rule instead of a runtime branch.
"""

from __future__ import annotations

import functools

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from panorama_opticalflow_tpu.ops.pallas import kernels
from panorama_opticalflow_tpu.utils.config import FlowParams


def _wrap(fn, n_in: int, n_out: int, axis: str, ranks_in: tuple[int, ...],
          ranks_out: tuple[int, ...]):
    """custom_partitioning wrapper: shard dim 0 of every operand and
    result over ``axis``, compute locally (the kernels are per-tile
    independent)."""
    f = custom_partitioning(fn)

    def _spec():
        return P(axis)

    def infer(mesh, arg_shapes, result_shape):
        out = tuple(NamedSharding(mesh, _spec()) for _ in range(n_out))
        return out if n_out > 1 else out[0]

    def part(mesh, arg_shapes, result_shape):
        arg_sh = tuple(NamedSharding(mesh, _spec()) for _ in range(n_in))
        out_sh = tuple(NamedSharding(mesh, _spec()) for _ in range(n_out))
        return mesh, fn, (out_sh if n_out > 1 else out_sh[0]), arg_sh

    # einsum-like Sdy rule: each operand/result partitions on its own
    # leading (batch) factor; trailing dims are private factors.
    names = []
    k = 0

    def term(rank, bi):
        nonlocal k
        dims = [f"b{bi}"]
        for _ in range(rank - 1):
            dims.append(f"d{k}")
            k += 1
        return " ".join(dims)

    ins = ", ".join(term(r, i) for i, r in enumerate(ranks_in))
    # results share batch factors with operand 0 (all our kernels'
    # outputs are batch-aligned with their first operand)
    outs = ", ".join(term(r, 0) for r in ranks_out)
    rule = f"{ins} -> {outs}"
    f.def_partition(infer_sharding_from_operands=infer, partition=part,
                    sharding_rule=rule)
    return f


@functools.lru_cache(maxsize=None)
def _relax_cp(axis: str, params: FlowParams, iters: int, D: int,
              tile: tuple[int, int], fuse_bf: bool):
    n_in = 9 if fuse_bf else 11

    if fuse_bf:
        def fn(fx, fy, bx, by, w1x, w1y, i0x, i0y, mask):
            return kernels.relax_phase_pallas(
                fx, fy, bx, by, w1x, w1y, i0x, i0y, None, None, mask,
                params=params, iters=iters, D=D, tile=tile, fuse_bf=True)
    else:
        def fn(fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy, mask):
            return kernels.relax_phase_pallas(
                fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy, mask,
                params=params, iters=iters, D=D, tile=tile, fuse_bf=False)

    return _wrap(fn, n_in, 2, axis, (3,) * n_in, (3, 3))


@functools.lru_cache(maxsize=None)
def _median5_cp(axis: str, bucket: bool):
    def fn(x):
        return kernels.median5_pallas(x, bucket=bucket)

    return _wrap(fn, 1, 1, axis, (3,), (3,))


@functools.lru_cache(maxsize=None)
def _median5_diffuse_cp(axis: str, ksize: int, sigma: float, bucket: bool):
    def fn(x, c):
        return kernels.median5_diffuse_pallas(x, c, ksize, sigma,
                                              bucket=bucket)

    return _wrap(fn, 2, 1, axis, (3, 3), (3,))


@functools.lru_cache(maxsize=None)
def _warp_cp(axis: str, tile: tuple[int, int], margin: int, max_off: int):
    def fn(img, flow):
        return kernels.warp_tiled_pallas(img, flow, tile=tile,
                                         margin=margin, max_off=max_off)

    return _wrap(fn, 2, 1, axis, (4, 4), (4,))


class CPKernels:
    """Kernel namespace with the same entry signatures as
    ``ops.pallas.kernels`` but with each call partitioned over its
    leading batch dim via custom_partitioning.  Passed as the ``knd``
    argument of the level core (models.pixflow) by the hybrid sharded
    solver (parallel/hybrid.py)."""

    def __init__(self, axis: str):
        self.axis = axis

    def relax_phase_pallas(self, fx, fy, bx, by, w1x, w1y, i0x, i0y,
                           bfx, bfy, mask, params: FlowParams, iters: int,
                           D: int, tile=(64, 256), fuse_bf: bool = False):
        f = _relax_cp(self.axis, params, int(iters), int(D), tuple(tile),
                      bool(fuse_bf))
        if fuse_bf:
            assert bfx is None and bfy is None
            return f(fx, fy, bx, by, w1x, w1y, i0x, i0y, mask)
        return f(fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy, mask)

    def median5_pallas(self, x, bucket: bool = True):
        return _median5_cp(self.axis, bool(bucket))(x)

    def median5_diffuse_pallas(self, x, c, ksize: int = 15,
                               sigma: float = 8.0, bucket: bool = True):
        return _median5_diffuse_cp(self.axis, int(ksize), float(sigma),
                                   bool(bucket))(x, c)

    def warp_tiled_pallas(self, img, flow, tile=(64, 128), margin: int = 8,
                          max_off: int = 96):
        return _warp_cp(self.axis, tuple(tile), int(margin),
                        int(max_off))(img, flow)
