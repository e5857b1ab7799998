"""Pallas kernels in interpreter mode on CPU: catches kernel-logic
regressions without TPU hardware (the real-hardware parity check is
tools/check_pallas.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panorama_opticalflow_tpu.ops import image as im
from panorama_opticalflow_tpu.ops import relax_fast as rf
from panorama_opticalflow_tpu.ops.pallas import kernels
from panorama_opticalflow_tpu.utils.config import flow_params_by_name


@pytest.fixture
def interp():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_median5_kernel_interpret(rng, interp):
    x = rng.random((40, 70), np.float32).astype(np.float32)
    ref = np.asarray(im.median5(jnp.asarray(x)))
    got = np.asarray(kernels.median5_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("fold,w1_bf16", [(True, False), (False, False),
                                          (True, True)])
def test_relax_kernel_interpret(rng, interp, fold, w1_bf16):
    import dataclasses

    params = dataclasses.replace(flow_params_by_name("pixflow_low"),
                                 fold_descent_sample=fold,
                                 w1_bf16=w1_bf16)
    h, w = 48, 96
    mk = lambda s=0.1: rng.standard_normal((h, w)).astype(np.float32) * s
    i0x, i0y, w1x, w1y = mk(), mk(), mk(), mk()
    flow = np.stack([mk(0.5), mk(0.5)], -1)
    f_base = flow + np.stack([mk(0.2), mk(0.2)], -1)
    bf = np.stack([mk(0.5), mk(0.5)], -1)
    mask = rng.random((h, w)) > 0.1

    w1g = jnp.stack([jnp.asarray(w1x), jnp.asarray(w1y)], -1)
    ref = np.asarray(rf.relax_phase_fast(
        jnp.asarray(flow), jnp.asarray(f_base), w1g,
        jnp.asarray(i0x), jnp.asarray(i0y), jnp.asarray(bf),
        jnp.asarray(mask), params, iters=2, D=3))

    fx, fy = kernels.relax_phase_pallas(
        jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1]),
        jnp.asarray(f_base[..., 0]), jnp.asarray(f_base[..., 1]),
        jnp.asarray(w1x), jnp.asarray(w1y),
        jnp.asarray(i0x), jnp.asarray(i0y),
        jnp.asarray(bf[..., 0]), jnp.asarray(bf[..., 1]),
        jnp.asarray(mask.astype(np.float32)), params, 2, 3,
        tile=(32, 128))
    got = np.stack([np.asarray(fx), np.asarray(fy)], -1)
    inner = np.s_[6:-6, 6:-6]
    np.testing.assert_allclose(got[inner], ref[inner], atol=1e-5)


def test_median5_kernel_batched_interpret(rng, interp):
    x = rng.random((3, 40, 70)).astype(np.float32)
    ref = np.stack([np.asarray(im.median5(jnp.asarray(x[i])))
                    for i in range(3)])
    got = np.asarray(kernels.median5_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_relax_kernel_batched_interpret(rng, interp):
    """The direction-batched grid (leading batch dim) must match the jnp
    path per batch element."""
    params = flow_params_by_name("pixflow_low")
    b, h, w = 2, 48, 96
    mk = lambda s=0.1: rng.standard_normal((b, h, w)).astype(np.float32) * s
    i0x, i0y, w1x, w1y = mk(), mk(), mk(), mk()
    flow = np.stack([mk(0.5), mk(0.5)], -1)
    f_base = flow + np.stack([mk(0.2), mk(0.2)], -1)
    bf = np.stack([mk(0.5), mk(0.5)], -1)
    mask = rng.random((b, h, w)) > 0.1

    refs = []
    for i in range(b):
        w1g = jnp.stack([jnp.asarray(w1x[i]), jnp.asarray(w1y[i])], -1)
        refs.append(np.asarray(rf.relax_phase_fast(
            jnp.asarray(flow[i]), jnp.asarray(f_base[i]), w1g,
            jnp.asarray(i0x[i]), jnp.asarray(i0y[i]), jnp.asarray(bf[i]),
            jnp.asarray(mask[i]), params, iters=2, D=3)))
    ref = np.stack(refs)

    fx, fy = kernels.relax_phase_pallas(
        jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1]),
        jnp.asarray(f_base[..., 0]), jnp.asarray(f_base[..., 1]),
        jnp.asarray(w1x), jnp.asarray(w1y),
        jnp.asarray(i0x), jnp.asarray(i0y),
        jnp.asarray(bf[..., 0]), jnp.asarray(bf[..., 1]),
        jnp.asarray(mask.astype(np.float32)), params, 2, 3,
        tile=(32, 128))
    got = np.stack([np.asarray(fx), np.asarray(fy)], -1)
    inner = np.s_[:, 6:-6, 6:-6]
    np.testing.assert_allclose(got[inner], ref[inner], atol=1e-5)
