#!/usr/bin/env python
"""Cost of the coarsest-level solve (zero init + exact relaxation,
coarsest_relax_phases x iters) at the old (24 px) vs new (64 px)
pyramid floor -- the E2 regression suspect (TPU gathers in the exact
path scale badly)."""
import sys

sys.path.insert(0, "/root/repo")

from panorama_opticalflow_tpu.utils.runtime import init_runtime  # noqa: E402

init_runtime(verbose=False)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.bench_micro import device_time  # noqa: E402
from panorama_opticalflow_tpu.models import pixflow  # noqa: E402
from panorama_opticalflow_tpu.utils.config import flow_params_by_name  # noqa: E402

params = flow_params_by_name("pixflow_low_fast")
rng = np.random.RandomState(0)
for (h, w) in [(25, 22), (44, 39), (67, 60), (88, 79)]:
    imgs = jnp.asarray(rng.rand(2, h, w).astype(np.float32))
    alphas = jnp.asarray((rng.rand(2, h, w) > 0.05).astype(np.float32))
    fn = jax.jit(lambda i, a: pixflow.patch_match_level_batched(
        i, a, None, ("left", "right"), params))
    t = device_time(lambda i, a: fn(i, a), imgs, alphas, iters=3)
    print(f"coarsest {h}x{w}: {t*1e3:8.2f} ms", flush=True)
