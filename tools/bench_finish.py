#!/usr/bin/env python
"""Decompose the finish (combine + composite) and blend stages at the
headline window shapes (tools/bench_chain.py: finish 258 ms/pair, blend
135 ms/pair at 9000x4000).

Usage: python tools/bench_finish.py [canvas WxH] [window width]
       defaults 9000x4000 and 3584 (the r3 256-quantized headline window).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from panorama_opticalflow_tpu.utils.runtime import init_runtime  # noqa: E402

init_runtime(verbose=False)

import jax.numpy as jnp  # noqa: E402

from panorama_opticalflow_tpu.models import novel_view, stitcher  # noqa: E402
from panorama_opticalflow_tpu.ops.distance import (  # noqa: E402
    eight_ray_min_distance, two_class_hole_search)
from panorama_opticalflow_tpu.ops.warp import (  # noqa: E402
    sample_nearest_wrap, sample_nearest_wrap_tiled)
from panorama_opticalflow_tpu.utils.config import StitchConfig  # noqa: E402
from tools.bench_micro import device_time  # noqa: E402


def main():
    w, h = (int(t) for t in (sys.argv[1] if len(sys.argv) > 1
                             else "9000x4000").split("x"))
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 3584
    cfg = StitchConfig()
    rng = np.random.RandomState(0)

    img_w = jnp.asarray(rng.randint(0, 255, (h, width, 4), dtype=np.uint8))
    img2_w = jnp.asarray(rng.randint(0, 255, (h, width, 4), dtype=np.uint8))
    flow_w = jnp.asarray((rng.rand(h, width, 2) * 40 - 20)
                         .astype(np.float32))
    flow2_w = jnp.asarray((rng.rand(h, width, 2) * 40 - 20)
                          .astype(np.float32))
    blend_w = jnp.asarray(rng.rand(h, width).astype(np.float32))
    # canvas map with all four codes present
    cmap = jnp.asarray(rng.choice([0, 50, 100, 150], (h, w), p=[0.2, 0.3, 0.3, 0.2]).astype(np.uint8))
    img_f = jnp.asarray(rng.randint(0, 255, (h, w, 4), dtype=np.uint8))
    img2_f = jnp.asarray(rng.randint(0, 255, (h, w, 4), dtype=np.uint8))
    merged_f = jnp.asarray(rng.randint(0, 255, (h, w, 4), dtype=np.uint8))

    # combine_novel_views routes to the tiled sampler at these shapes:
    # time it as the per-combine cost, and the exact gather for contrast
    t = device_time(lambda i, f, b: sample_nearest_wrap_tiled(i, f, b),
                    img_w, flow_w, blend_w, iters=6)
    print(f"sample_nearest_wrap_tiled {h}x{width}: {t*1e3:7.2f} ms "
          f"(x2 per combine)")
    t = device_time(lambda i, f, b: sample_nearest_wrap(i, f, b),
                    img_w, flow_w, blend_w, iters=6)
    print(f"sample_nearest_wrap (exact gather): {t*1e3:7.2f} ms (not the "
          f"production path at this size)")

    t = device_time(novel_view.combine_novel_views,
                    img_w, img2_w, flow_w, flow2_w, blend_w, iters=6)
    print(f"combine window {h}x{width}:       {t*1e3:7.2f} ms")

    t = device_time(lambda c, a, b, m: stitcher.gather_composite(
        c, a, b, m, cfg, window=(jnp.asarray(128), width)),
        cmap, img_f, img2_f, merged_f, iters=6)
    print(f"gather_composite windowed:        {t*1e3:7.2f} ms")

    t = device_time(lambda c, a, b, m: stitcher.gather_composite(
        c, a, b, m, cfg), cmap, img_f, img2_f, merged_f, iters=4)
    print(f"gather_composite full-canvas:     {t*1e3:7.2f} ms")

    t = device_time(lambda c: stitcher.generate_blend(
        c, cfg, window=(jnp.asarray(128), width))[0], cmap, iters=6)
    print(f"generate_blend windowed:          {t*1e3:7.2f} ms")

    step = max(1, min(h, w) // cfg.blend_step_div)
    cm_w = cmap[:, :width]
    t = device_time(lambda c: eight_ray_min_distance(c == 100, step, w / 2.0),
                    cm_w, iters=6)
    print(f"eight_ray windowed (x2 in blend): {t*1e3:7.2f} ms")

    t = device_time(lambda c: jnp.stack(two_class_hole_search(
        c == 100, c == 50, cfg.gather_search_radius)[0:1]), cm_w, iters=6)
    print(f"hole_search windowed:             {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
