"""pixflow_search_20 end-to-end: the brute-force init must recover a
shift beyond what zero-init gradient descent reaches at the coarsest
level, and the full stitch must work in search mode."""

import numpy as np

import jax.numpy as jnp

from panorama_opticalflow_tpu.models import pipeline, pixflow
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.config import (StitchConfig,
                                                   flow_params_by_name)


def test_search20_flow_end_to_end(rng):
    import cv2

    h, w = 64, 96
    base = rng.integers(0, 256, (h, w + 8, 4), np.uint8)
    base[..., 3] = 255
    base[..., :3] = cv2.GaussianBlur(base[..., :3], (7, 7), 2.0)
    i0, i1 = base[:, :w], base[:, 6:6 + w]
    params = flow_params_by_name("pixflow_search_20")
    flow = np.asarray(pixflow.compute_optical_flow(
        jnp.asarray(i0), jnp.asarray(i1), params, "left"))
    inner = flow[16:-16, 20:-20]
    assert np.abs(inner[..., 0] - (-6.0)).mean() < 1.5


def test_stitch_four_search20(rng):
    photos = pio.synthesize_four_input_set(48, 128, seed=2)
    cfg = StitchConfig(flow_alg="pixflow_search_20")
    out = np.asarray(pipeline.stitch_four(
        [jnp.asarray(p) for p in photos], cfg))
    assert out.shape == (48, 128, 4)
    assert (out[..., 3] > 0).mean() > 0.99
