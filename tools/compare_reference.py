#!/usr/bin/env python
"""Head-to-head against the ACTUAL reference implementation.

Builds nothing itself: expects the reference CPU binaries compiled by
tools/reference_baseline/build.sh (shim headers; sources compile in
place from /root/reference).  Generates a synthetic 6-input set, runs
the reference binary and this framework on the SAME inputs, and reports
wall times plus SSIM between the two FinalResults.

The reference treats channels symmetrically (alpha is index 3 for both
cv2's BGRA and our RGBA view of the same TIFFs), so both on-disk PNGs
are directly comparable.

Prints one JSON line, e.g.
  {"canvas": "2250x1000", "ref_s": ..., "ours_s": ..., "ssim": ...}
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, ".cache", "refbuild", "ref_stitch6")
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", default="2250x1000")
    ap.add_argument("--flow_alg", default="pixflow_low")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"],
                    help="backend for OUR run (reference is always CPU)")
    ap.add_argument("--test_dir", default=None,
                    help="reuse an existing synthetic set / work dir")
    ap.add_argument("--skip_ref", action="store_true")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--variant", type=int, default=6, choices=[4, 6],
                    help="6-input iterative or 4-input single-pass")
    args = ap.parse_args()
    w, h = (int(t) for t in args.canvas.split("x"))

    if args.backend == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.metrics import ssim

    four = args.variant == 4
    sentinel = "1.tif" if four else "top.tif"
    d = args.test_dir or tempfile.mkdtemp(prefix="refcmp_")
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, sentinel)):
        if four:
            for i, img in enumerate(
                    pio.synthesize_four_input_set(h, w, seed=0), start=1):
                pio.write_image(os.path.join(d, f"{i}.tif"), img)
        else:
            photos_np, top_np = pio.synthesize_fisheye_set(h, w, n=5, seed=0)
            for i, img in enumerate(photos_np, start=1):
                pio.write_image(os.path.join(d, f"{i}.tif"), img)
            pio.write_image(os.path.join(d, "top.tif"), top_np)

    out = {"canvas": args.canvas, "flow_alg": args.flow_alg,
           "variant": args.variant, "test_dir": d}

    ref_bin = REF_BIN.replace("ref_stitch6", "ref_stitch4") if four \
        else REF_BIN
    ref_png = os.path.join(d, "FinalResult_ref.png")
    if not args.skip_ref and not os.path.exists(ref_png):
        if not os.path.exists(ref_bin):
            sys.exit(f"missing {ref_bin}; run tools/reference_baseline/"
                     "build.sh first")
        t0 = time.time()
        # glibc.malloc.mmap_max=0: the reference's Gather walks rays out
        # of bounds (/root/reference/CPU/StitchTool.cpp:78, UB); at
        # >=36 MP canvases cv::Mat buffers come from mmap and the OOB
        # read segfaults.  Forcing sbrk-heap allocations keeps the reads
        # inside mapped memory, reproducing the in-bounds-by-luck
        # behavior the reference has at small canvases.
        env = dict(os.environ, GLIBC_TUNABLES="glibc.malloc.mmap_max=0")
        subprocess.run(
            [ref_bin, "-test_dir", d, "-top_img", "top.tif",
             # the reference only knows the two base presets; the
             # _fast variants are framework extensions gated against
             # the base reference output
             "-flow_alg", args.flow_alg.replace("_fast", "")],
            check=True, env=env)
        out["ref_s"] = round(time.time() - t0, 2)
        os.rename(os.path.join(d, "FinalResult.png"), ref_png)

    ours_png = os.path.join(d, "FinalResult_ours.png")
    if not args.skip_ours:
        import jax
        import numpy as np

        from panorama_opticalflow_tpu.models import pipeline
        from panorama_opticalflow_tpu.utils.config import StitchConfig
        from panorama_opticalflow_tpu.utils.native_io import write_image_fast

        cfg = StitchConfig(flow_alg=args.flow_alg)
        n_in = 4 if four else 5
        photos = [jax.device_put(
            pio.read_image_rgba(os.path.join(d, f"{i}.tif")))
            for i in range(1, n_in + 1)]
        from panorama_opticalflow_tpu.utils.runtime import init_runtime

        init_runtime(verbose=False)
        top = None if four else jax.device_put(
            pio.read_image_rgba(os.path.join(d, "top.tif")))

        def run():
            t0 = time.time()
            res = (pipeline.stitch_four(photos, cfg) if four
                   else pipeline.stitch_six(photos, top, cfg))
            res_np = np.asarray(res)
            return res_np, round(time.time() - t0, 2)

        res_np, out["ours_cold_s"] = run()     # includes jit compile
        _, out["ours_s"] = run()               # warm
        out["ours_backend"] = jax.devices()[0].platform
        write_image_fast(ours_png, res_np)

    if os.path.exists(ref_png) and os.path.exists(ours_png):
        a = pio.read_image_rgba(ref_png).astype("float32")
        b = pio.read_image_rgba(ours_png).astype("float32")
        # compare on RGB over the union footprint; both alphas agree on
        # shape by construction
        out["ssim"] = round(float(ssim(a[..., :3], b[..., :3],
                                       data_range=255.0)), 4)
        if "ref_s" in out and "ours_s" in out:
            out["speedup"] = round(out["ref_s"] / out["ours_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
