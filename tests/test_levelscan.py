"""Rung-scanned coarse-pyramid descent (models/pixflow._run_rungs).

The scanned path must (a) use resize weights bit-identical to the static
resize (ops/image.resize_axis_matrix), and (b) agree with the unrolled
descent up to the documented border approximation (blur/median borders
at scanned levels' bottom/right valid edges see replicated rather than
reflected content)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panorama_opticalflow_tpu.models import pixflow
from panorama_opticalflow_tpu.ops import image as im
from panorama_opticalflow_tpu.utils.config import flow_params_by_name


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_resize_axis_matrix_matches_static_resize(rng):
    for n_in, n_out, n_pad in ((37, 41, 48), (41, 37, 48), (24, 27, 27),
                               (100, 111, 128)):
        x = rng.random((n_in, 33)).astype(np.float32)
        want = np.asarray(im.resize(jnp.asarray(x), (n_out, 33), "cubic"))
        a = im.resize_axis_matrix(n_in, n_out, n_pad, "cubic")
        xp = np.zeros((n_pad, 33), np.float32)
        xp[:n_in] = x
        xp[n_in:] = rng.random((n_pad - n_in, 33))  # garbage must be ignored
        got = a @ xp
        np.testing.assert_allclose(got[:n_out], want, atol=1e-4, rtol=1e-5)
        # padded output rows replicate the last valid row
        np.testing.assert_array_equal(got[n_out:],
                                      np.broadcast_to(got[n_out - 1],
                                                      (n_pad - n_out, 33)))


def test_mat_resize_flow_matches_vresize(rng):
    hp, wp = 40, 56
    h_in, w_in, h_out, w_out = 33, 47, 37, 52
    f = jnp.asarray(rng.standard_normal((2, hp, wp, 2)).astype(np.float32))
    ah = jnp.asarray(im.resize_axis_matrix(h_in, h_out, hp, "cubic"))
    aw = jnp.asarray(im.resize_axis_matrix(w_in, w_out, wp, "cubic"))
    got = np.asarray(pixflow._mat_resize_flow(f, ah, aw))
    want = np.asarray(jax.vmap(
        lambda x: im.resize(x, (h_out, w_out), "cubic"))(
        f[:, :h_in, :w_in].reshape(2, h_in, w_in, 2)
        .transpose(0, 3, 1, 2).reshape(4, h_in, w_in)))
    want = want.reshape(2, 2, h_out, w_out).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got[:, :h_out, :w_out], want,
                               atol=1e-4, rtol=1e-5)


def _smooth_pair(rng, h, w, shift=3):
    import cv2
    base = rng.integers(0, 256, (h, w + shift, 4), np.uint8)
    base[..., 3] = 255
    base[..., :3] = cv2.GaussianBlur(base[..., :3], (9, 9), 3.0)
    i0, i1 = base[:, :w].copy(), base[:, shift:shift + w].copy()
    i0[:, :w // 8, 3] = 0  # a low-alpha strip exercises the masks
    i1[:, -w // 8:, 3] = 0
    return i0, i1


def test_plan_rungs_partition():
    p = flow_params_by_name("pixflow_low")
    p = dataclasses.replace(p, scan_max_pixels=10**9, scan_rung_levels=4)
    sizes = pixflow.pyramid_sizes(100, 160, p)
    first, rungs = pixflow._plan_rungs(sizes, p)
    assert first == 1  # finest level always unrolled
    flat = [i for r in rungs for i in r]
    assert flat == list(range(1, len(sizes) - 1))  # coarsest excluded
    assert all(len(r) <= 4 for r in rungs)
    # disabled paths
    off = dataclasses.replace(p, scan_coarse_levels=False)
    assert pixflow._plan_rungs(sizes, off) == (len(sizes), [])
    tiny = dataclasses.replace(p, scan_max_pixels=0)
    assert pixflow._plan_rungs(sizes, tiny) == (len(sizes), [])


def test_scanned_descent_close_to_unrolled(rng):
    i0, i1 = _smooth_pair(rng, 120, 176)
    base = flow_params_by_name("pixflow_low")
    p_scan = dataclasses.replace(base, scan_max_pixels=10**9)
    p_unroll = dataclasses.replace(base, scan_coarse_levels=False)
    f_s = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i0), jnp.asarray(i1), p_scan, "left"))
    f_u = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i0), jnp.asarray(i1), p_unroll, "left"))
    epe = np.sqrt(((f_s - f_u) ** 2).sum(-1))
    mag = np.sqrt((f_u ** 2).sum(-1)).mean()
    assert epe.mean() < 0.08 * max(mag, 1.0), (epe.mean(), mag)
    assert np.percentile(epe, 99) < 0.5 * max(mag, 1.0)


def test_scanned_pair_matches_two_single_calls(rng):
    """Statistical gates like test_pixflow's pair-vs-single check: the
    batched and single rung bodies are the same math, but the resize
    matmuls' fp reduction order differs by batch shape and 1-ulp noise
    flips strictly-less propagation accepts on isolated pixels."""
    i0, i1 = _smooth_pair(rng, 120, 192)
    p = dataclasses.replace(flow_params_by_name("pixflow_low"),
                            scan_max_pixels=10**9)
    f01 = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i0), jnp.asarray(i1), p, "left"))
    f10 = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i1), jnp.asarray(i0), p, "right"))
    g01, g10 = pixflow.compute_optical_flow_pair(
        jnp.asarray(i0), jnp.asarray(i1), p, "left", "right")
    for got, ref in ((g01, f01), (g10, f10)):
        d = np.abs(np.asarray(got) - ref)
        # mean tolerance 0.02: the single-phase default schedule keeps
        # one median per level (vs 2), so isolated ulp-flip pixels
        # survive ~a level longer before a median reabsorbs them
        # (measured 0.012 at 1x3 vs 0.008 at 2x2); the outlier gate
        # below still catches any systematic divergence.
        assert d.mean() < 0.02, d.mean()
        assert (d > 0.2).mean() < 0.01, (d > 0.2).mean()


def test_plan_rungs_invariants_fuzz():
    """Planner invariants across random sizes/knobs: scanned levels form
    a contiguous block [first, n-2] partitioned in order; every rung's
    finest member is its first; lo is respected."""
    rng = np.random.default_rng(0)
    base = flow_params_by_name("pixflow_low")
    for _ in range(200):
        h = int(rng.integers(24, 2000))
        w = int(rng.integers(24, 2000))
        p = dataclasses.replace(
            base,
            scan_max_pixels=int(rng.integers(1, 1_000_000)),
            scan_rung_levels=int(rng.integers(1, 7)),
            scan_min_levels=int(rng.integers(1, 6)),
            scan_coarse_levels=bool(rng.integers(0, 2)))
        sizes = pixflow.pyramid_sizes(h, w, p)
        lo = int(rng.integers(0, max(1, len(sizes))))
        first, rungs = pixflow._plan_rungs(sizes, p, lo=lo)
        flat = [i for r in rungs for i in r]
        if not rungs:
            assert first == len(sizes)
            continue
        n = len(sizes)
        assert flat == list(range(first, n - 1))  # contiguous, ordered
        assert first >= max(lo, 1)
        assert len(flat) >= p.scan_min_levels
        assert sizes[first][0] * sizes[first][1] <= p.scan_max_pixels
        for r in rungs:
            assert len(r) <= p.scan_rung_levels
            # rung shape is its finest member's shape
            assert all(sizes[r[0]][0] >= sizes[i][0]
                       and sizes[r[0]][1] >= sizes[i][1] for i in r)
