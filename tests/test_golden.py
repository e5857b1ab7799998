"""Golden-output regression tests.

tests/golden/*.npz pin the current pipeline outputs on synthetic sets
(regenerate with tools/make_golden.py after intentional algorithm
changes).  Gates are SSIM + bounded-diff rather than bit-equality so
ulp-level XLA partitioning differences (which flip strictly-less
propagation accepts at isolated pixels) don't flake, while any real
semantic drift fails loudly.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from panorama_opticalflow_tpu.models import pipeline
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.config import StitchConfig
from panorama_opticalflow_tpu.utils.metrics import ssim

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    return np.load(path)["output"]


def _check(out, golden):
    assert out.shape == golden.shape
    np.testing.assert_array_equal(out[..., 3], golden[..., 3])  # footprint
    s = ssim(out, golden)
    assert s >= 0.995, s
    diff = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert (diff > 8).mean() < 0.01, (diff > 8).mean()


def test_golden_six_input():
    photos, top = pio.synthesize_fisheye_set(96, 320, n=5, seed=7)
    out = np.asarray(pipeline.stitch_six(
        [jnp.asarray(p) for p in photos], jnp.asarray(top),
        StitchConfig(flow_alg="pixflow_low")))
    _check(out, _load("six_96x320_s7"))


def test_golden_four_input():
    photos = pio.synthesize_four_input_set(96, 320, seed=1)
    out = np.asarray(pipeline.stitch_four(
        [jnp.asarray(p) for p in photos],
        StitchConfig(flow_alg="pixflow_low")))
    _check(out, _load("four_96x320_s1"))


def test_golden_six_input_search20():
    photos, top = pio.synthesize_fisheye_set(64, 256, n=5, seed=3)
    out = np.asarray(pipeline.stitch_six(
        [jnp.asarray(p) for p in photos], jnp.asarray(top),
        StitchConfig(flow_alg="pixflow_search_20")))
    _check(out, _load("six_64x256_s3_search20"))


def test_vs_reference_binary_golden():
    """Fidelity against the ACTUAL reference binary's output, pinned at
    the smallest canvas the reference supports (its blend box-blur
    kernels need >= 400 rows).  The golden was produced by
    tools/compare_reference.py --canvas 900x400 on the seed-0 synthetic
    set (tools/reference_baseline builds the reference C++ in place).
    Runs in the default suite (the only default gate against the
    compiled reference; ~2.5 min of the budget)."""
    golden_path = os.path.join(GOLDEN_DIR, "reference_binary_900x400_low.png")
    golden = pio.read_image_rgba(golden_path)
    photos, top = pio.synthesize_fisheye_set(400, 900, n=5, seed=0)
    out = np.asarray(pipeline.stitch_six(
        [jnp.asarray(p) for p in photos], jnp.asarray(top),
        StitchConfig(flow_alg="pixflow_low")))
    s = ssim(out[..., :3].astype(np.float32),
             golden[..., :3].astype(np.float32))
    assert s >= 0.98, s


@pytest.mark.skipif(not os.environ.get("PANOSTITCH_SLOW_TESTS"),
                    reason="~5 min on 2-core CPU; set PANOSTITCH_SLOW_TESTS=1")
def test_fast_preset_vs_reference_binary_golden():
    """The pixflow_low_fast extension (0.8-factor pyramid, ~half the
    levels) must still match the reference binary's pixflow_low output
    (measured 0.9988 SSIM at introduction)."""
    golden_path = os.path.join(GOLDEN_DIR, "reference_binary_900x400_low.png")
    golden = pio.read_image_rgba(golden_path)
    photos, top = pio.synthesize_fisheye_set(400, 900, n=5, seed=0)
    out = np.asarray(pipeline.stitch_six(
        [jnp.asarray(p) for p in photos], jnp.asarray(top),
        StitchConfig(flow_alg="pixflow_low_fast")))
    s = ssim(out[..., :3].astype(np.float32),
             golden[..., :3].astype(np.float32))
    assert s >= 0.98, s
