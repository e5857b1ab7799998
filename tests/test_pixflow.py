"""Pixflow solver tests: component-exact vs the sequential oracle, and
statistical/SSIM agreement for the full solver (the Jacobi relaxation is
a deliberate reformulation of the sequential sweeps, so full-solver
equality is measured, not bitwise)."""

import numpy as np
import pytest

import jax.numpy as jnp

from panorama_opticalflow_tpu.models import pixflow
from panorama_opticalflow_tpu.ops.warp import bilinear_extend
from panorama_opticalflow_tpu.utils.config import flow_params_by_name
from panorama_opticalflow_tpu.utils.metrics import endpoint_error

import oracle_pixflow as opf


def _rand_rgba(rng, h, w, alpha=255):
    img = rng.integers(0, 256, (h, w, 4), np.uint8)
    img[..., 3] = alpha
    return img


def _shifted_pair(rng, h, w, shift):
    """I1 is I0 shifted ``shift`` columns (true flow = (-shift, 0) when
    sampling I1 at x + flow)."""
    base = rng.integers(0, 256, (h, w + abs(shift), 4), np.uint8)
    base[..., 3] = 255
    # smooth the pattern so gradients carry signal
    import cv2
    base[..., :3] = cv2.GaussianBlur(base[..., :3], (7, 7), 2.0)
    i0 = base[:, :w]
    i1 = base[:, shift:shift + w]
    return i0, i1


def test_pyramid_sizes_match_reference_formula():
    p = flow_params_by_name("pixflow_low")
    sizes = pixflow.pyramid_sizes(40, 60, p)
    assert sizes == [(40, 60), (36, 54), (32, 49), (29, 44), (26, 40)]
    # ends before either side would drop to <= 24
    nh = int(sizes[-1][0] * 0.9 + 0.5)
    nw = int(sizes[-1][1] * 0.9 + 0.5)
    assert nh <= 24 or nw <= 24


def test_bilinear_extend_matches_oracle(rng):
    img = rng.random((9, 13)).astype(np.float32)
    xs = rng.uniform(-2, 14, 50).astype(np.float32)
    ys = rng.uniform(-2, 10, 50).astype(np.float32)
    ours = np.asarray(bilinear_extend(jnp.asarray(img), jnp.asarray(xs),
                                      jnp.asarray(ys)))
    ref = np.array([opf.bilinear_extend(img, x, y) for x, y in zip(xs, ys)])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_error_function_matches_oracle(rng):
    h, w = 12, 16
    p = opf.P()
    params = flow_params_by_name("pixflow_low")
    i0x = rng.random((h, w)).astype(np.float32)
    i0y = rng.random((h, w)).astype(np.float32)
    i1x = rng.random((h, w)).astype(np.float32)
    i1y = rng.random((h, w)).astype(np.float32)
    bf = rng.normal(0, 1, (h, w, 2)).astype(np.float32)
    cand = rng.normal(0, 2, (h, w, 2)).astype(np.float32)
    i1g = jnp.stack([jnp.asarray(i1x), jnp.asarray(i1y)], axis=-1)
    ours = np.asarray(pixflow.error_function(
        jnp.asarray(cand), jnp.asarray(i0x), jnp.asarray(i0y), i1g,
        jnp.asarray(bf), params))
    for y in (0, 5, 11):
        for x in (0, 7, 15):
            ref = opf.error_function(p, i0x, i0y, i1x, i1y, x, y, bf,
                                     cand[y, x, 0], cand[y, x, 1], w)
            np.testing.assert_allclose(ours[y, x], ref, rtol=1e-5)


@pytest.mark.parametrize("hint", ["left", "right"])
def test_adjust_initial_flow_matches_oracle(rng, hint):
    h, w = 14, 20
    p = opf.P(max_percentage=20)
    params = flow_params_by_name("pixflow_search_20")
    i0 = rng.random((h, w)).astype(np.float32)
    i1 = rng.random((h, w)).astype(np.float32)
    a0 = (rng.random((h, w)) > 0.2).astype(np.float32)
    a1 = (rng.random((h, w)) > 0.2).astype(np.float32)
    ours = np.asarray(pixflow.adjust_initial_flow(
        jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(a0), jnp.asarray(a1),
        hint, params))
    ref = np.zeros((h, w, 2), np.float32)
    opf.adjust_initial_flow(p, i0, i1, a0, a1, ref, hint)
    np.testing.assert_array_equal(ours, ref)


def test_low_alpha_diffusion_matches_oracle(rng):
    import cv2
    h, w = 20, 26
    params = flow_params_by_name("pixflow_low")
    flow = rng.normal(0, 2, (h, w, 2)).astype(np.float32)
    a0 = rng.random((h, w)).astype(np.float32)
    a1 = rng.random((h, w)).astype(np.float32)
    ours = np.asarray(pixflow.low_alpha_flow_diffusion(
        jnp.asarray(flow), jnp.asarray(a0), jnp.asarray(a1), params))
    blurred = cv2.GaussianBlur(flow, (15, 15), 8.0)
    c = (1.0 - a0 * a1)[..., None]
    ref = c * blurred + (1 - c) * flow
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_full_flow_recovers_known_shift(rng):
    """End-to-end sanity: a pure horizontal shift must be recovered with
    sub-pixel-ish accuracy in the valid interior."""
    i0, i1 = _shifted_pair(rng, 72, 112, 4)
    params = flow_params_by_name("pixflow_low")
    flow = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i0), jnp.asarray(i1), params, "left"))
    assert flow.shape == (72, 112, 2)
    inner = flow[16:-16, 24:-24]
    # sampling I1 at x + flow reproduces I0 when flow approximately
    # equals -shift... the solver finds I0(x) = I1(x + f) so f = -4? No:
    # I1 = base shifted left content-wise; I1[x] = base[x+4] = I0[x+4]
    # => I0[x] = I1[x-4] => f = -4.
    err = np.abs(inner[..., 0] - (-4.0)).mean()
    assert err < 1.2, err
    assert np.abs(inner[..., 1]).mean() < 1.0


def test_full_flow_close_to_sequential_oracle(rng):
    """Jacobi relaxation vs the reference's sequential sweeps on a small
    synthetic pair: mean endpoint difference must be small."""
    i0, i1 = _shifted_pair(rng, 56, 88, 3)
    params = flow_params_by_name("pixflow_low")
    ours = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i0), jnp.asarray(i1), params, "left"))
    ref = opf.compute_optical_flow(i0, i1, opf.P(0), "left")
    epe = endpoint_error(ours, ref)
    assert epe < 1.0, epe


def test_pair_solver_matches_two_single_calls(rng):
    """compute_optical_flow_pair (direction-batched) must match two
    independent compute_optical_flow calls for both presets.

    The comparison is statistical, not bitwise: the batched and
    unbatched programs are mathematically identical (verified bit-exact
    on a single-threaded CPU backend), but XLA partitions them
    differently under the test harness's 8-virtual-device CPU flag,
    and 1-ulp float differences flip strictly-less propagation accepts
    (CPU/PixFlow.hpp:342-362), which perturbs isolated pixels.  Gross
    errors (a swapped direction, a wrong hint, broken batching) move
    the whole field and fail these gates by orders of magnitude."""
    h, w = 56, 72
    i0, i1 = _shifted_pair(rng, h, w, 2)
    i0[:, :6, 3] = 0   # some invalid regions so masks/diffusion engage
    i1[:, -6:, 3] = 0
    for alg in ("pixflow_low", "pixflow_search_20"):
        p = flow_params_by_name(alg)
        f01 = np.asarray(pixflow.compute_optical_flow(
            jnp.asarray(i0), jnp.asarray(i1), p, "left"))
        f10 = np.asarray(pixflow.compute_optical_flow(
            jnp.asarray(i1), jnp.asarray(i0), p, "right"))
        g01, g10 = pixflow.compute_optical_flow_pair(
            jnp.asarray(i0), jnp.asarray(i1), p, "left", "right")
        for got, ref in ((g01, f01), (g10, f10)):
            d = np.abs(np.asarray(got) - ref)
            assert d.mean() < 0.01, (alg, d.mean())
            assert (d > 0.2).mean() < 0.01, (alg, (d > 0.2).mean())
