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


def test_median5_kernel_vmap_interpret(rng, interp):
    """jax.vmap over the kernel wrapper must fold into the leading grid
    dim (regression: the default batched-BlockSpec rule fails Mosaic
    lowering on TPU)."""
    x = rng.random((3, 40, 70)).astype(np.float32)
    ref = np.asarray(kernels.median5_pallas(jnp.asarray(x)))
    got = np.asarray(jax.vmap(kernels.median5_pallas)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)
    # nested batch dims (vmap over an already direction-batched call)
    x2 = rng.random((2, 2, 40, 70)).astype(np.float32)
    ref2 = np.stack([np.asarray(kernels.median5_pallas(jnp.asarray(x2[i])))
                     for i in range(2)])
    got2 = np.asarray(jax.vmap(kernels.median5_pallas)(jnp.asarray(x2)))
    np.testing.assert_array_equal(got2, ref2)


def test_relax_kernel_vmap_interpret(rng, interp):
    """jax.vmap over relax_phase_pallas (as batched-panorama stitching
    produces) must match per-element unbatched calls."""
    params = flow_params_by_name("pixflow_low")
    b, h, w = 2, 48, 96
    mk = lambda s=0.1: rng.standard_normal((b, h, w)).astype(np.float32) * s
    planes = [mk(0.5), mk(0.5), mk(0.6), mk(0.6), mk(), mk(),
              mk(), mk(), mk(0.5), mk(0.5),
              (rng.random((b, h, w)) > 0.1).astype(np.float32)]
    jp = [jnp.asarray(p) for p in planes]

    refs = [kernels.relax_phase_pallas(
        *[p[i] for p in jp], params, 2, 3, tile=(32, 128))
        for i in range(b)]
    ref_fx = np.stack([np.asarray(r[0]) for r in refs])
    ref_fy = np.stack([np.asarray(r[1]) for r in refs])

    vfx, vfy = jax.vmap(
        lambda *a: kernels.relax_phase_pallas(*a, params, 2, 3,
                                              tile=(32, 128)))(*jp)
    np.testing.assert_allclose(np.asarray(vfx), ref_fx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vfy), ref_fy, atol=1e-6)


def test_median5_diffuse_kernel_interpret(rng, interp):
    """Fused median+diffusion kernel vs the jnp composition
    (c*gauss15(med) + (1-c)*med); interior only -- the kernel's blur
    sees edge-replicated canvas borders vs reflect-101 in jnp."""
    params = flow_params_by_name("pixflow_low")
    b, h, w = 2, 48, 96
    x = rng.standard_normal((2 * b, h, w)).astype(np.float32)
    c = rng.random((b, h, w)).astype(np.float32)

    med = np.stack([np.asarray(im.median5(jnp.asarray(x[k])))
                    for k in range(2 * b)])
    blur = np.stack([np.asarray(im.gaussian_blur(
        jnp.asarray(med[k]), params.blurred_flow_kernel_width,
        params.blurred_flow_sigma)) for k in range(2 * b)])
    cc = np.repeat(c, 2, axis=0)
    ref = cc * blur + (1.0 - cc) * med

    got = np.asarray(kernels.median5_diffuse_pallas(
        jnp.asarray(x), jnp.asarray(c)))
    inner = np.s_[:, 8:-8, 8:-8]
    np.testing.assert_allclose(got[inner], ref[inner], atol=1e-5)

    # vmap composability (batched stitching folds into the grid dim)
    got_v = np.asarray(jax.vmap(kernels.median5_diffuse_pallas)(
        jnp.asarray(x[None]), jnp.asarray(c[None])))[0]
    np.testing.assert_allclose(got_v[inner], got[inner], atol=1e-6)


def test_relax_kernel_fused_bf_interpret(rng, interp):
    """relax_phase_pallas(fuse_bf=True) must match the unfused kernel fed
    the jnp-blurred f_base (interior: border band differs by blur pad
    mode)."""
    params = flow_params_by_name("pixflow_low")
    h, w = 64, 128
    mk = lambda s=0.1: rng.standard_normal((h, w)).astype(np.float32) * s
    i0x, i0y, w1x, w1y = mk(), mk(), mk(), mk()
    fx, fy = mk(0.5), mk(0.5)
    bx, by = fx + mk(0.1), fy + mk(0.1)
    mask = (rng.random((h, w)) > 0.1).astype(np.float32)
    bfx = np.asarray(im.gaussian_blur(
        jnp.asarray(bx), params.blurred_flow_kernel_width,
        params.blurred_flow_sigma))
    bfy = np.asarray(im.gaussian_blur(
        jnp.asarray(by), params.blurred_flow_kernel_width,
        params.blurred_flow_sigma))

    args = [jnp.asarray(a) for a in (fx, fy, bx, by, w1x, w1y, i0x, i0y)]
    ref_fx, ref_fy = kernels.relax_phase_pallas(
        *args, jnp.asarray(bfx), jnp.asarray(bfy), jnp.asarray(mask),
        params, 2, 2, tile=(32, 128))
    got_fx, got_fy = kernels.relax_phase_pallas(
        *args, None, None, jnp.asarray(mask),
        params, 2, 2, tile=(32, 128), fuse_bf=True)
    inner = np.s_[12:-12, 12:-12]
    np.testing.assert_allclose(np.asarray(got_fx)[inner],
                               np.asarray(ref_fx)[inner], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_fy)[inner],
                               np.asarray(ref_fy)[inner], atol=1e-5)


def test_fused_level_matches_jnp_level_interpret(rng, interp, monkeypatch):
    """The full fused single-phase level (patch_match_level with
    fuse_level_blurs on the Pallas path) vs the jnp level path."""
    import dataclasses

    from panorama_opticalflow_tpu.models import pixflow

    params = dataclasses.replace(flow_params_by_name("pixflow_low"),
                                 pallas_min_pixels=0)
    assert params.relax_phases == 1 and params.fuse_level_blurs
    h, w = 64, 128
    mk = lambda s: rng.standard_normal((h, w)).astype(np.float32) * s
    i0 = rng.random((h, w)).astype(np.float32)
    i1 = np.clip(i0 + mk(0.05), 0, 1)
    a0 = (rng.random((h, w)) > 0.05).astype(np.float32)
    a1 = (rng.random((h, w)) > 0.05).astype(np.float32)
    flow = np.stack([mk(0.5), mk(0.5)], -1)

    ref = np.asarray(pixflow.patch_match_level(
        jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(a0), jnp.asarray(a1),
        jnp.asarray(flow), "left", params))
    monkeypatch.setattr(kernels, "on_tpu", lambda: True)
    got = np.asarray(pixflow.patch_match_level(
        jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(a0), jnp.asarray(a1),
        jnp.asarray(flow), "left", params))
    # border contamination depth: bf-blur pad-mode difference (7) ->
    # relax+median (5) -> diffusion blur (7)
    inner = np.s_[19:-19, 19:-19]
    np.testing.assert_allclose(got[inner], ref[inner], atol=2e-4)


def test_warp_tiled_kernel_interpret(rng, interp):
    """Dynamic-offset-DMA warp kernel vs the XLA block-gather warp at
    the SAME default (64, 128) tile decomposition: same per-tile integer
    offsets and residual hat passes, so outputs agree to summation
    order (bit-exact on hardware, check_pallas --warp)."""
    h, w, c = 200, 520, 2
    img = rng.standard_normal((h, w, c)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = 20 * np.sin(yy / 37.0) + 5 * np.cos(xx / 53.0)
    fy = 8 * np.cos(yy / 29.0) - 3 * np.sin(xx / 41.0)
    flow = np.stack([fx, fy], -1).astype(np.float32)

    ref = np.asarray(rf.warp_by_flow_tiled(jnp.asarray(img),
                                           jnp.asarray(flow)))
    got = np.asarray(kernels.warp_tiled_pallas(jnp.asarray(img),
                                               jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, atol=2e-6)

    # extra vmap dim folds into the grid (batched-pair production shape)
    imgs = np.stack([img, img[::-1]])
    flows = np.stack([flow, -flow])
    gotb = np.asarray(jax.vmap(lambda a, f: kernels.warp_tiled_pallas(a, f))(
        jnp.asarray(imgs), jnp.asarray(flows)))
    refb1 = np.asarray(rf.warp_by_flow_tiled(jnp.asarray(imgs[1]),
                                             jnp.asarray(flows[1])))
    np.testing.assert_allclose(gotb[0], ref, atol=2e-6)
    np.testing.assert_allclose(gotb[1], refb1, atol=2e-6)
