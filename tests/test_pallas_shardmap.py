"""Pallas kernels composed with shard_map halo exchange.

The production multi-chip configuration runs the Pallas relax/median
kernels *inside* the row-tiled shard_map pipeline (parallel/tiled.py with
FlowParams.use_pallas).  CPU tests normally take the jnp branch (the
``pallas_ok`` gate requires a TPU backend), so this composition was
otherwise never exercised off-hardware: here the gate is monkeypatched
open and the kernels run in TPU interpret mode inside a 2-device
shard_map, compared against the identical tiling on the jnp branch.
The real-hardware twin is ``tools/check_pallas.py --shardmap``.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map
import jax

from panorama_opticalflow_tpu.parallel import tiled
from panorama_opticalflow_tpu.parallel.mesh import make_mesh
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.config import flow_params_by_name
from panorama_opticalflow_tpu.utils.metrics import endpoint_error

AXIS = "y"
N = 2


@pytest.fixture
def force_pallas(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from panorama_opticalflow_tpu.ops.pallas import kernels

    monkeypatch.setattr(kernels, "on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _tiled_pair_flow(l, r, params, tc, h):
    mesh = make_mesh(N)

    def body(a, b):
        flr, frl = tiled.tiled_compute_optical_flow_pair(
            a, b, params, ("left", "right"), AXIS, N, h, tc)
        return jnp.concatenate([flr, frl], axis=-1)

    # check_vma=False as in tiled.tiled_stitch_pair: pallas_call outputs
    # carry no vma annotation
    fn = shard_map(body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                   out_specs=P(AXIS), check_vma=False)
    out = np.asarray(jax.jit(fn)(l, r))
    return out[..., :2], out[..., 2:]


def test_pallas_kernels_inside_shardmap(rng, force_pallas):
    # genuinely tiled fine levels (halo exchange feeding the kernels) plus
    # the replicated tail, all through the Pallas branch in interpret mode
    h, w = 256, 96
    photos, _ = pio.synthesize_fisheye_set(h, w, n=2, seed=7, with_top=False)
    l, r = photos
    # pallas_min_pixels picks out the finest (tiled, halo-extended) level
    # only: that is the kernel+halo-exchange composition under test; the
    # coarser levels stay on the jnp branch to keep interpret cost down
    base = dataclasses.replace(flow_params_by_name("pixflow_low"),
                               relax_iters_per_phase=3,
                               pallas_min_pixels=5000,
                               pallas_tile=(32, 128))
    tc = tiled.TileConfig(min_tiled_rows=48, level_halo=28)
    assert tc.level_halo >= tiled.derive_level_halo(base, 0)

    from panorama_opticalflow_tpu.models import pixflow

    f_pl, f_pr = _tiled_pair_flow(l, r, base, tc, h)
    f_jl, f_jr = pixflow.compute_optical_flow_pair(
        jnp.asarray(l), jnp.asarray(r), base)

    # gate vs the *untiled* solver with the tiled==untiled bound
    # (test_tiled.test_tiled_flow_matches_untiled): the interpret-mode
    # kernels-in-shard_map composition must stay within the same
    # approximation class (halo truncation + kernel array-edge
    # replication, amplified by the coarse->fine 1/0.9 upsamples).
    for got, ref in ((f_pl, f_jl), (f_pr, f_jr)):
        got = np.asarray(got)
        ref = np.asarray(ref)
        assert got.shape == ref.shape == (h, w, 2)
        epe = endpoint_error(got[8:-8], ref[8:-8])
        assert epe < 0.05, epe
