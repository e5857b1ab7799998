"""Command-line drivers, parity with the reference mains.

  stitch6: 6-input iterative stitch (CPU/main.cpp:47-110) -- reads
    1.tif..5.tif plus a top image from --test_dir, writes
    ProcessResult{1..4}.png and FinalResult.png.
  stitch4: 4-input single-pass stitch (CPU_4Input/main.cpp:47-119) --
    reads 1.tif..4.tif, writes FinalResult.png.
  synth: generate a synthetic test set (the reference's Test_data blobs
    are not redistributable).

Flags mirror the reference gflags (-test_dir, -top_img, -flow_alg) with
required-argument validation (CPU/util.hpp:45-49).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from panorama_opticalflow_tpu.utils import io as pio
from panorama_opticalflow_tpu.utils import native_io as nio
from panorama_opticalflow_tpu.utils.config import StitchConfig
from panorama_opticalflow_tpu.utils.runtime import StageTimer, init_runtime, log


def _require(args, name: str) -> None:
    if not getattr(args, name):
        sys.exit(f"missing required command line argument: --{name}")


def _load(test_dir: str, name: str) -> np.ndarray:
    for ext in ("", ".tif", ".tiff", ".png"):
        path = os.path.join(test_dir, name + ext)
        if os.path.exists(path):
            return nio.read_image_rgba_fast(path)
    raise pio.PanoIOError(f"failed to load image: {os.path.join(test_dir, name)}")


def cmd_stitch6(args) -> None:
    from panorama_opticalflow_tpu.models import crop, pipeline

    _require(args, "test_dir")
    _require(args, "top_img")
    _require(args, "flow_alg")
    cfg = StitchConfig(flow_alg=args.flow_alg)
    timer = StageTimer()

    import jax.numpy as jnp

    # --resume: the reference's de-facto checkpointing is the per-part
    # ProcessResult{i}.png (R is just the previous output,
    # CPU/main.cpp:64-65,97-100) -- pick up from the newest one.
    start = 1
    top = _load(args.test_dir, args.top_img)
    result = jnp.asarray(top)
    if getattr(args, "resume", False):
        for i in range(4, 0, -1):
            path = os.path.join(args.test_dir, f"ProcessResult{i}.png")
            if os.path.exists(path):
                result = jnp.asarray(nio.read_image_rgba_fast(path))
                start = i + 1
                log.info("resuming from %s (parts 1..%d done)", path, i)
                break

    images = [jnp.asarray(_load(args.test_dir, str(i)))
              for i in range(start, 6)]
    # plan every pair's overlap window up front (no per-pair host syncs)
    windows = crop.plan_chain_windows(images, result, cfg)

    for i, (image_l, window) in enumerate(zip(images, windows), start=start):
        with timer.stage(f"Part{i}"):
            if args.debug_dump:
                result, inter = pipeline.stitch_pair_debug(
                    image_l, result, cfg)
                pipeline.dump_intermediates(inter, args.debug_dump,
                                            f"part{i}", args.flow_alg)
            else:
                result = pipeline.stitch_pair_auto(image_l, result, cfg,
                                                   window=window)
            result.block_until_ready()
        name = "FinalResult.png" if i == 5 else f"ProcessResult{i}.png"
        nio.write_image_fast(os.path.join(args.test_dir, name),
                             np.asarray(result))
    timer.total()


def cmd_stitch4(args) -> None:
    from panorama_opticalflow_tpu.models import pipeline

    _require(args, "test_dir")
    _require(args, "flow_alg")
    cfg = StitchConfig(flow_alg=args.flow_alg)
    timer = StageTimer()

    import jax.numpy as jnp

    images = [jnp.asarray(_load(args.test_dir, str(i))) for i in range(1, 5)]
    with timer.stage("Stitch"):
        if args.debug_dump:
            il, ir = pipeline.compose_four(jnp.stack(images))
            result, inter = pipeline.stitch_pair_debug(il, ir, cfg)
            pipeline.dump_intermediates(inter, args.debug_dump, "stitch",
                                        args.flow_alg)
        else:
            result = pipeline.stitch_four(images, cfg)
        result.block_until_ready()
    nio.write_image_fast(os.path.join(args.test_dir, "FinalResult.png"),
                         np.asarray(result))
    timer.total()


def cmd_synth(args) -> None:
    _require(args, "test_dir")
    os.makedirs(args.test_dir, exist_ok=True)
    if args.four:
        photos = pio.synthesize_four_input_set(args.height, args.width,
                                               seed=args.seed)
        for i, img in enumerate(photos, start=1):
            pio.write_image(os.path.join(args.test_dir, f"{i}.tif"), img)
    else:
        photos, top = pio.synthesize_fisheye_set(args.height, args.width,
                                                 seed=args.seed)
        for i, img in enumerate(photos, start=1):
            pio.write_image(os.path.join(args.test_dir, f"{i}.tif"), img)
        pio.write_image(os.path.join(args.test_dir, "top.tif"), top)
    log.info("wrote synthetic set to %s", args.test_dir)


def main(argv=None) -> None:
    init_runtime()
    p = argparse.ArgumentParser(prog="panostitch", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--test_dir", default="",
                        help="path to dir with test files")
        sp.add_argument("--flow_alg", default="",
                        help="pixflow_low or pixflow_search_20")
        sp.add_argument("--debug_dump", default="",
                        help="directory for intermediate/flow-vis dumps")
        sp.add_argument("--profile_dir", default="",
                        help="write a jax.profiler trace per stage "
                             "(TensorBoard/XProf format) into this dir")

    sp6 = sub.add_parser("stitch6", help="6-input iterative stitch")
    common(sp6)
    sp6.add_argument("--top_img", default="",
                     help="top image filename (relative to test_dir)")
    sp6.add_argument("--resume", action="store_true",
                     help="resume from the newest ProcessResult{i}.png")
    sp6.set_defaults(fn=cmd_stitch6)

    sp4 = sub.add_parser("stitch4", help="4-input single-pass stitch")
    common(sp4)
    sp4.set_defaults(fn=cmd_stitch4)

    sps = sub.add_parser("synth", help="generate synthetic test data")
    sps.add_argument("--test_dir", default="")
    sps.add_argument("--height", type=int, default=400)
    sps.add_argument("--width", type=int, default=900)
    sps.add_argument("--seed", type=int, default=0)
    sps.add_argument("--four", action="store_true",
                     help="generate the 4-input wide-angle set")
    sps.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    if getattr(args, "profile_dir", ""):
        # StageTimer wraps each stage in jax.profiler.trace when set
        os.environ["PANOSTITCH_TRACE_DIR"] = args.profile_dir
    args.fn(args)


if __name__ == "__main__":
    main()
