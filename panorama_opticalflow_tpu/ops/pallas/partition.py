"""Batch-dim partitioning wrappers for the Pallas kernels.

Round-5 restructure (ROADMAP item 2): the sharded stitch used to call
the Pallas kernels deep inside its ONE whole-stitch shard_map body,
where the axon-v5e toolchain miscompiles Mosaic custom-calls embedded
in large manual-sharding programs (r3/r4 probes; the
optimization_barrier fence in kernels.py fixed the standalone solver
but not the full stitch).  The structural fix: the sharded pipeline
keeps halo exchanges, resizes and collectives in tiny shard_map bodies,
runs the per-level solver between them on row-stacked tile batches
under ordinary GSPMD partitioning, and invokes each kernel through a
MINIMAL manual region -- a shard_map whose body is exactly one kernel
call, partitioned over the leading batch (= tile) dimension.  The
scheduler then has nothing to misorder around the Mosaic custom-call
inside the manual region (the r3/r4 failure mode), and every kernel
operand enters pinned to its own region boundary.

(A first cut used ``jax.experimental.custom_partitioning`` -- zero
manual regions at all -- but its tracing rejects functions that create
trace-time constants (``assert not len(consts)``), which the kernel
impls do; the one-kernel shard_map achieves the same isolation without
that restriction.)

Every kernel operand/result here carries the tile batch as dim 0 and
per-device batch counts stay integral (the tiled solver always passes
multiples of the mesh size).  The GPU-dispatch analogue in the
reference is the device-count scan + kernel-vs-CPU fallback
(GPU/OpticalFlow.cpp:132-155); here the dispatch decision is a static
program structure instead of a runtime branch.
"""

from __future__ import annotations

from jax import shard_map
from jax.sharding import PartitionSpec as P

from panorama_opticalflow_tpu.ops.pallas import kernels
from panorama_opticalflow_tpu.utils.config import FlowParams


class PartitionedKernels:
    """Kernel namespace with the same entry signatures as
    ``ops.pallas.kernels`` but with each call running in its own
    one-kernel shard_map partitioned over the leading batch dim.
    Passed as the ``knd`` argument of the level core (models.pixflow)
    by the hybrid sharded solver (parallel/hybrid.py)."""

    def __init__(self, mesh, axis: str):
        self.mesh = mesh
        self.axis = axis

    def _run(self, fn, n_out: int, *args):
        spec = P(self.axis)
        out_specs = tuple(spec for _ in range(n_out))
        return shard_map(fn, mesh=self.mesh,
                         in_specs=tuple(spec for _ in args),
                         out_specs=out_specs if n_out > 1 else spec,
                         check_vma=False)(*args)

    def relax_phase_pallas(self, fx, fy, bx, by, w1x, w1y, i0x, i0y,
                           bfx, bfy, mask, params: FlowParams, iters: int,
                           D: int, tile=(64, 256), fuse_bf: bool = False):
        if fuse_bf:
            assert bfx is None and bfy is None

            def fn(*p):
                return kernels.relax_phase_pallas(
                    *p[:8], None, None, p[8], params=params, iters=iters,
                    D=D, tile=tile, fuse_bf=True)

            return self._run(fn, 2, fx, fy, bx, by, w1x, w1y, i0x, i0y,
                             mask)

        def fn(*p):
            return kernels.relax_phase_pallas(
                *p, params=params, iters=iters, D=D, tile=tile,
                fuse_bf=False)

        return self._run(fn, 2, fx, fy, bx, by, w1x, w1y, i0x, i0y,
                         bfx, bfy, mask)

    def median5_pallas(self, x, bucket: bool = True):
        return self._run(lambda a: kernels.median5_pallas(a, bucket=bucket),
                         1, x)

    def median5_diffuse_pallas(self, x, c, ksize: int = 15,
                               sigma: float = 8.0, bucket: bool = True):
        return self._run(
            lambda a, b: kernels.median5_diffuse_pallas(
                a, b, ksize, sigma, bucket=bucket), 1, x, c)

    def warp_tiled_pallas(self, img, flow, tile=(64, 128), margin: int = 8,
                          max_off: int = 96):
        return self._run(
            lambda a, b: kernels.warp_tiled_pallas(
                a, b, tile=tile, margin=margin, max_off=max_off),
            1, img, flow)
