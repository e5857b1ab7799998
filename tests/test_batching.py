"""Batched stitching: vmap over canvas pairs (SURVEY.md section 2 north
star -- 'batched stitching via vmap')."""

import numpy as np

import jax
import jax.numpy as jnp

from panorama_opticalflow_tpu.models import pipeline
from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils.config import StitchConfig


def test_vmapped_stitch_matches_sequential(rng):
    cfg = StitchConfig()
    pairs = []
    for seed in (1, 2, 3):
        photos = pio.synthesize_four_input_set(40, 96, seed=seed)
        l, r = pipeline.compose_four(jnp.stack([jnp.asarray(p)
                                                for p in photos]))
        pairs.append((np.asarray(l), np.asarray(r)))
    ls = jnp.stack([p[0] for p in pairs])
    rs = jnp.stack([p[1] for p in pairs])

    batched = jax.jit(jax.vmap(lambda a, b: pipeline.stitch_pair(a, b, cfg)))
    outs = np.asarray(batched(ls, rs))

    for k, (l, r) in enumerate(pairs):
        ref = np.asarray(pipeline.stitch_pair(jnp.asarray(l),
                                              jnp.asarray(r), cfg))
        # vmap reassociates reductions, so tiny fp differences can flip
        # argmin/threshold decisions on a handful of pixels
        same = (outs[k] == ref).mean()
        assert same > 0.98, same
        diff = np.abs(outs[k].astype(int) - ref.astype(int))
        assert np.percentile(diff, 99.9) <= 8, diff.max()
