"""Stitch-geometry tests: vectorised scan formulations vs the per-pixel
reference-semantics oracle."""

import numpy as np
import pytest

from panorama_opticalflow_tpu.models import stitcher
from panorama_opticalflow_tpu.ops.distance import eight_ray_min_distance
from panorama_opticalflow_tpu.utils.config import StitchConfig

import oracle


def _synthetic_pair(rng, h=24, w=40):
    """Two RGBA canvases with overlapping vertical-strip footprints."""
    l = rng.integers(0, 256, (h, w, 4), np.uint8)
    r = rng.integers(0, 256, (h, w, 4), np.uint8)
    l[..., 3] = 0
    r[..., 3] = 0
    l[:, : w * 5 // 8, 3] = 255       # L occupies left 5/8
    r[:, w * 3 // 8:, 3] = 255        # R occupies right 5/8 -> overlap band
    return l, r


@pytest.mark.parametrize("step", [1, 3])
def test_eight_ray_distance_matches_oracle(rng, step):
    mask = rng.random((17, 23)) < 0.08
    ours = np.asarray(eight_ray_min_distance(mask, step, 11.0))
    ref = oracle.ray_min_distance(mask, step, 11.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_eight_ray_distance_gather_scale(rng):
    mask = rng.random((15, 19)) < 0.1
    ours = np.asarray(eight_ray_min_distance(mask, 1, 8.0, diag_scale=1.0))
    ref = oracle.ray_min_distance(mask, 1, 8.0, diag_scale=1.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("radius", [1, 2, 8, 100])
def test_two_class_hole_search_matches_two_fields(rng, radius):
    """The fused int16 class-encoded field must reproduce the two-field
    d_l <= d_r decision exactly, including L-wins-ties."""
    from panorama_opticalflow_tpu.ops.distance import (
        eight_ray_unit_min_distance, two_class_hole_search)

    mask_l = rng.random((33, 41)) < 0.05
    mask_r = (rng.random((33, 41)) < 0.05) & ~mask_l
    d_l = np.asarray(eight_ray_unit_min_distance(mask_l, radius))
    d_r = np.asarray(eight_ray_unit_min_distance(mask_r, radius))
    found, take_l = (np.asarray(a) for a in
                     two_class_hole_search(mask_l, mask_r, radius))
    np.testing.assert_array_equal(found,
                                  np.isfinite(np.minimum(d_l, d_r)))
    np.testing.assert_array_equal(take_l[found], (d_l <= d_r)[found])


@pytest.mark.parametrize("radius", [1, 2, 8, 100])
def test_eight_ray_unit_bounded_matches_scan(rng, radius):
    """The pointer-doubling hole search (gather_composite's radius-
    bounded formulation) must be exactly the unit-stride scan field."""
    from panorama_opticalflow_tpu.ops.distance import (
        eight_ray_unit_min_distance)

    mask = rng.random((33, 41)) < 0.06
    ours = np.asarray(eight_ray_unit_min_distance(mask, radius))
    ref = np.asarray(eight_ray_min_distance(mask, 1, float(radius),
                                            diag_scale=1.0))
    np.testing.assert_array_equal(ours, ref)


def test_match_images_and_overlap(rng):
    l, r = _synthetic_pair(rng)
    m = np.asarray(stitcher.match_images(l, r))
    w = l.shape[1]
    assert set(np.unique(m)) <= {0, 50, 100, 150}
    assert (m[:, : w * 3 // 8] == 100).all()
    assert (m[:, w * 5 // 8:] == 50).all()
    assert (m[:, w * 3 // 8: w * 5 // 8] == 150).all()

    ol = np.asarray(stitcher.extract_overlap(l, m))
    assert (ol[m != 150] == 0).all()
    np.testing.assert_array_equal(ol[m == 150], l[m == 150])


def test_generate_blend_matches_oracle(rng):
    l, r = _synthetic_pair(rng, h=20, w=40)
    m = np.asarray(stitcher.match_images(l, r))
    cfg = StitchConfig()  # h=20 -> smoothing kernels < 2, disabled
    blend, mdis = stitcher.generate_blend(np.asarray(m), cfg)
    ref_blend, ref_mdis = oracle.countblend_field(m)
    np.testing.assert_allclose(np.asarray(blend), ref_blend, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mdis), ref_mdis, atol=1e-5)
    b = np.asarray(blend)
    band = b[:, 40 * 3 // 8: 40 * 5 // 8]
    assert band.min() >= 0.0 and band.max() <= 1.0
    # blend must increase L->R across the overlap band on average
    assert band[:, -1].mean() > band[:, 0].mean()


def test_gather_composite_matches_oracle(rng):
    l, r = _synthetic_pair(rng, h=18, w=32)
    m = np.asarray(stitcher.match_images(l, r))
    merged = rng.integers(0, 256, l.shape, np.uint8)
    # merged covers only part of the overlap -> leaves 150-coded holes
    merged[..., 3] = 0
    merged[4:14, 32 * 3 // 8: 32 * 4 // 8, 3] = 255
    cfg = StitchConfig()
    ours = np.asarray(stitcher.gather_composite(m, l, r, merged, cfg))
    ref = oracle.gather_loop(m, l, r, merged)
    np.testing.assert_array_equal(ours, ref)


def test_generate_blend_half_scale_close_to_exact(rng):
    """The r5 fast-preset blend decimation (StitchConfig.blend_scale):
    the half-resolution field must track the reference-exact one
    closely after the smoothing stack -- it feeds a crossfade, so the
    gate is field-level closeness, not bit-equality."""
    l, r = _synthetic_pair(rng, h=400, w=800)
    m = stitcher.match_images(l, r)
    cfg = StitchConfig()
    exact, _ = stitcher.generate_blend(m, cfg, scale=1)
    half, _ = stitcher.generate_blend(m, cfg, scale=2)
    e, hv = np.asarray(exact), np.asarray(half)
    assert hv.shape == e.shape
    assert abs(float(np.mean(hv)) - float(np.mean(e))) < 0.01
    assert float(np.abs(hv - e).mean()) < 0.02, np.abs(hv - e).mean()
    # pure regions are exact
    mm = np.asarray(m)
    np.testing.assert_allclose(hv[mm == 100], e[mm == 100], atol=2e-2)

    # auto-resolution: _fast presets decimate, parity preset never does
    assert StitchConfig(flow_alg="pixflow_low_fast").blend_scale_resolved == 2
    assert StitchConfig(flow_alg="pixflow_low").blend_scale_resolved == 1
    assert StitchConfig(flow_alg="pixflow_low_fast",
                        blend_scale=1).blend_scale_resolved == 1
