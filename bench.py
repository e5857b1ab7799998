#!/usr/bin/env python
"""Benchmark: end-to-end 6-photo equirectangular stitch latency.

Headline config (BASELINE.md): 6 photos onto a 9000x4000 canvas,
pixflow_low, iterative 5-pair stitching -- the reference reports <30 s on
a CUDA-era GPU (README.md:10-12,35); target is <3 s on TPU.

Prints ONE json line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}
vs_baseline = reference_seconds / ours (>1 means faster than reference).

Env overrides:
  PANOSTITCH_BENCH_CANVAS=WxH   (default 9000x4000)
  PANOSTITCH_BENCH_REPEATS=N    (default 1 timed repeat after warmup)
  PANOSTITCH_BENCH_ALG=NAME     (default pixflow_low_fast; also
                                 pixflow_low | pixflow_search_20 | ...)

The default preset is the framework's production one (0.8-factor
pyramid): SSIM 0.9997 vs the reference-parity pixflow_low output at
this canvas (tools/fidelity_36mp.py, PERFORMANCE.md) and 0.9988 vs the
compiled reference binary on the golden canvas -- both far above the
0.98 north-star gate.  Set PANOSTITCH_BENCH_ALG=pixflow_low for the
reference-parity preset (2.15 s vs 1.60 s at 36 MP).
"""

import json
import os
import sys
import time

# the reference reports <30 s for the 9000x4000 (36 MP) stitch; scale
# the budget by canvas area when benching smaller sizes so vs_baseline
# stays apples-to-apples
REFERENCE_SECONDS = 30.0
REFERENCE_MP = 36.0


def run_once(w: int, h: int, repeats: int, alg: str) -> dict:

    from panorama_opticalflow_tpu.utils.runtime import init_runtime

    init_runtime(verbose=False)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from panorama_opticalflow_tpu.models import pipeline
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig

    photos_np, top_np = pio.synthesize_fisheye_set(h, w, n=5, seed=0)
    dev = jax.devices()[0]
    photos = [jax.device_put(p, dev) for p in photos_np]
    top = jax.device_put(top_np, dev)
    cfg = StitchConfig(flow_alg=alg)

    def force(x):
        # the dev tunnel's block_until_ready does not actually block;
        # fetching one element forces the computation with a 4-byte
        # transfer
        return np.asarray(x[:1, :1, :1])

    # warmup / compile: the full chain (pairs with distinct window
    # buckets compile separately; the persistent cache carries them over)
    t0 = time.time()
    out = pipeline.stitch_six(photos, top, cfg)
    force(out)
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        result = pipeline.stitch_six(photos, top, cfg)
        force(result)
        best = min(best, time.time() - t0)

    mp = h * w / 1e6
    ref_s = REFERENCE_SECONDS * mp / REFERENCE_MP
    measured = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "MEASURED_BASELINE.json")) as f:
            measured = json.load(f)[f"stitch6_{alg}"].get(f"{w}x{h}")
    except Exception:  # noqa: BLE001
        pass
    extra = {}
    if measured:
        extra = {"measured_ref_s": measured,
                 "vs_measured_ref": round(measured / best, 2)}
    return {
        "metric": f"6-photo {w}x{h} stitch latency ({alg}, "
                  f"{jax.devices()[0].platform})",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(ref_s / best, 2),
        "reference_s_scaled": round(ref_s, 2),
        "canvas_mp": round(mp, 1),
        "mp_per_s": round(5 * mp / best, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        **extra,
    }


def main() -> None:
    # the 36 MP headline programs compile in ~13 min through the dev
    # tunnel compiler when the persistent cache is cold (fresh-clone
    # rounds) -- warm this size FIRST thing each round (CLAUDE.md); the
    # half-size fallbacks below cover a flaking remote compiler
    canvas = os.environ.get("PANOSTITCH_BENCH_CANVAS", "9000x4000")
    repeats = int(os.environ.get("PANOSTITCH_BENCH_REPEATS", "1"))
    alg = os.environ.get("PANOSTITCH_BENCH_ALG", "pixflow_low_fast")
    w, h = (int(t) for t in canvas.split("x"))
    # fall back through half-sizes if the headline size fails (e.g. the
    # dev tunnel's remote compiler flaking); the metric label stays
    # honest about what ran
    sizes = [(w, h), (w // 2, h // 2), (w // 4, h // 4)]
    last_err = None
    for ww, hh in sizes:
        try:
            print(json.dumps(run_once(ww, hh, repeats, alg)))
            return
        except Exception as e:  # noqa: BLE001
            last_err = e
            print(f"# bench at {ww}x{hh} failed: {e}", file=sys.stderr)
    print(json.dumps({"metric": "bench failed", "value": -1, "unit": "s",
                      "vs_baseline": 0, "error": str(last_err)[:200]}))


if __name__ == "__main__":
    sys.exit(main())
