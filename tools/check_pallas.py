#!/usr/bin/env python
"""Validate + time the Pallas TPU kernels against their jnp reference
implementations (run on the TPU; the CPU test suite covers the jnp
path)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")

from tools.bench_micro import device_time  # noqa: E402
from panorama_opticalflow_tpu.ops import image as im  # noqa: E402
from panorama_opticalflow_tpu.ops.pallas import kernels  # noqa: E402
from panorama_opticalflow_tpu.ops import relax_fast as rf  # noqa: E402
from panorama_opticalflow_tpu.utils.config import flow_params_by_name  # noqa: E402


def check_shardmap():
    """Production multi-chip configuration smoke on real hardware: a
    1-device mesh runs tiled_stitch_pair with the Pallas kernels enabled
    (use_pallas + pallas_min_pixels=0), i.e. kernels INSIDE shard_map
    with halo-exchange collectives compiled by the TPU backend.  Gated
    against the untiled stitch_pair on the same inputs."""
    from panorama_opticalflow_tpu.models import pipeline
    from panorama_opticalflow_tpu.parallel import tiled
    from panorama_opticalflow_tpu.parallel.mesh import make_mesh
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig
    from panorama_opticalflow_tpu.utils.metrics import ssim

    assert jax.default_backend() == "tpu", jax.default_backend()
    # at this size the fine flow levels exceed pallas_min_pixels, so the
    # kernels engage with the stock preset
    h, w = 512, 1024
    photos, _ = pio.synthesize_fisheye_set(h, w, n=2, seed=1, with_top=False)
    l, r = (jnp.asarray(p) for p in photos)
    cfg = StitchConfig(flow_alg="pixflow_low")
    tc = tiled.TileConfig(
        min_tiled_rows=32,
        level_halo=tiled.derive_level_halo(cfg.flow_params,
                                           flow_sample_margin=0))

    import dataclasses

    mesh = make_mesh(1)
    ref = np.asarray(pipeline.stitch_pair(l, r, cfg))
    out = np.asarray(tiled.tiled_stitch_pair(l, r, cfg, mesh, "y", tc))
    s = ssim(out[..., :3].astype(np.float32), ref[..., :3].astype(np.float32))
    print(f"tiled_stitch_pair (1-dev mesh, production jnp-in-shard_map) vs "
          f"untiled: SSIM {s:.4f} {'OK' if s >= 0.995 else 'FAIL'}")
    # canary for the axon Mosaic-in-shard_map miscompile (NaN flows at
    # some shapes/data -- see TileConfig.use_pallas_in_shardmap).  r4:
    # kernels default ON with a runtime non-finite-flow canary; at THIS
    # small-tile config the canary is expected to trip and auto-fall
    # back (the first call below logs the detection), which is the
    # behavior under test -- both SSIMs must still come back ~1.0.
    tck = dataclasses.replace(tc, use_pallas_in_shardmap=True)
    outk = np.asarray(tiled.tiled_stitch_pair(l, r, cfg, mesh, "y", tck))
    sk = ssim(outk[..., :3].astype(np.float32),
              ref[..., :3].astype(np.float32))
    print(f"tiled_stitch_pair (Pallas in shard_map canary): SSIM {sk:.4f} "
          f"{'OK' if sk >= 0.995 else 'MISCOMPILE (known, kernels off in '
          'shard_map by default)'}")


def check_hybrid():
    """Round-5 restructure gate on real hardware: the hybrid sharded
    stitch (kernels OUTSIDE shard_map via custom_partitioning,
    parallel/hybrid.py) at the small-tile shape where the in-shard_map
    kernels trip the canary.  Expected: NO canary trip (the module
    global stays False) and SSIM ~1 vs the untiled production stitch.
    """
    import dataclasses

    from panorama_opticalflow_tpu.models import pipeline
    from panorama_opticalflow_tpu.parallel import tiled
    from panorama_opticalflow_tpu.parallel.mesh import make_mesh
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig
    from panorama_opticalflow_tpu.utils.metrics import ssim

    assert jax.default_backend() == "tpu", jax.default_backend()
    h, w = 512, 1024
    photos, _ = pio.synthesize_fisheye_set(h, w, n=2, seed=1, with_top=False)
    l, r = (jnp.asarray(p) for p in photos)
    cfg = StitchConfig(flow_alg="pixflow_low")
    tc = tiled.TileConfig(
        min_tiled_rows=32, flow_mode="hybrid",
        level_halo=tiled.derive_level_halo(cfg.flow_params,
                                           flow_sample_margin=0))
    mesh = make_mesh(1)
    ref = np.asarray(pipeline.stitch_pair(l, r, cfg))
    t0 = time.time()
    out = np.asarray(tiled.tiled_stitch_pair(l, r, cfg, mesh, "y", tc))
    wall = time.time() - t0
    s = ssim(out[..., :3].astype(np.float32), ref[..., :3].astype(np.float32))
    tripped = tiled._hybrid_tripped
    print(f"hybrid sharded stitch (1-dev mesh, partitioned kernels): SSIM {s:.4f}"
          f" canary_tripped={tripped} wall={wall:.1f}s "
          f"{'OK' if s >= 0.995 and not tripped else 'FAIL'}")


def check_fused():
    """Hardware check of the round-3 fused kernels (median5+diffusion;
    in-kernel blurred-flow target) vs the jnp compositions."""
    rng = np.random.default_rng(1)
    params = flow_params_by_name("pixflow_low")
    H, W = 512, 1024

    # fused median + diffusion
    x = rng.standard_normal((4, H, W)).astype(np.float32)
    c = rng.random((2, H, W)).astype(np.float32)
    med = np.stack([np.asarray(im.median5(jnp.asarray(x[k])))
                    for k in range(4)])
    blur = np.stack([np.asarray(im.gaussian_blur(
        jnp.asarray(med[k]), params.blurred_flow_kernel_width,
        params.blurred_flow_sigma)) for k in range(4)])
    cc = np.repeat(c, 2, axis=0)
    ref = cc * blur + (1.0 - cc) * med
    got = np.asarray(jax.jit(kernels.median5_diffuse_pallas)(
        jnp.asarray(x), jnp.asarray(c)))
    inner = np.s_[:, 8:-8, 8:-8]
    err = np.abs(ref[inner] - got[inner]).max()
    print(f"median5_diffuse: max err inner {err:.2e} "
          f"{'OK' if err < 1e-4 else 'FAIL'}")

    # in-kernel blurred-flow target
    mk = lambda s=0.1: rng.standard_normal((H, W)).astype(np.float32) * s
    i0x, i0y, w1x, w1y = mk(), mk(), mk(), mk()
    fx, fy = mk(0.5), mk(0.5)
    bx, by = fx + mk(0.1), fy + mk(0.1)
    mask = (rng.random((H, W)) > 0.1).astype(np.float32)
    bfx = np.asarray(im.gaussian_blur(
        jnp.asarray(bx), params.blurred_flow_kernel_width,
        params.blurred_flow_sigma))
    bfy = np.asarray(im.gaussian_blur(
        jnp.asarray(by), params.blurred_flow_kernel_width,
        params.blurred_flow_sigma))
    args = [jnp.asarray(a) for a in (fx, fy, bx, by, w1x, w1y, i0x, i0y)]
    rfx, rfy = jax.jit(lambda: kernels.relax_phase_pallas(
        *args, jnp.asarray(bfx), jnp.asarray(bfy), jnp.asarray(mask),
        params, 3, 2))()
    gfx, gfy = jax.jit(lambda: kernels.relax_phase_pallas(
        *args, None, None, jnp.asarray(mask),
        params, 3, 2, fuse_bf=True))()
    inner = np.s_[16:-16, 16:-16]
    err = max(np.abs(np.asarray(rfx) - np.asarray(gfx))[inner].max(),
              np.abs(np.asarray(rfy) - np.asarray(gfy))[inner].max())
    print(f"relax fuse_bf: max err inner {err:.2e} "
          f"{'OK' if err < 1e-4 else 'FAIL'}")

    # timing at 10 MP
    from tools.bench_micro import device_time as dt
    big = rng.standard_normal((2, 2048, 2496)).astype(np.float32)
    bigc = rng.random((1, 2048, 2496)).astype(np.float32)
    t = dt(kernels.median5_diffuse_pallas, big, bigc, iters=10)
    print(f"median5_diffuse 10MP: {t*1e3:7.2f} ms (vs median+XLA blur+lerp)")


def check_warp():
    """Hardware parity + timing of the dynamic-offset-DMA warp kernel
    (round 4) vs the XLA block-gather warp at the headline's finest
    windowed level shape."""
    rng = np.random.default_rng(2)
    H, W = 2000, 1800        # ~ finest windowed flow level at 36 MP
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    fx = 20 * np.sin(yy / 37.0) + 5 * np.cos(xx / 53.0)
    fy = 8 * np.cos(yy / 29.0) - 3 * np.sin(xx / 41.0)
    flow = jnp.asarray(np.stack([fx, fy], -1))
    img = jnp.asarray(rng.standard_normal((H, W, 2)).astype(np.float32))

    ref = np.asarray(jax.jit(rf.warp_by_flow_tiled)(img, flow))
    got = np.asarray(jax.jit(kernels.warp_tiled_pallas)(img, flow))
    err = np.abs(ref - got).max()
    print(f"warp_tiled_pallas vs XLA(default tile): max err {err:.2e} "
          f"{'OK' if err < 1e-4 else 'FAIL'}")

    # direction-batched (the production call shape: vmap over 2 dirs)
    imgs = jnp.stack([img, img[::-1]])
    flows = jnp.stack([flow, -flow])
    vk = jax.jit(jax.vmap(lambda a, f: kernels.warp_tiled_pallas(a, f)))
    gotb = np.asarray(vk(imgs, flows))
    refb1 = np.asarray(jax.jit(rf.warp_by_flow_tiled)(imgs[1], flows[1]))
    err = max(np.abs(gotb[0] - ref).max(), np.abs(gotb[1] - refb1).max())
    print(f"warp_tiled_pallas vmapped: max err {err:.2e} "
          f"{'OK' if err < 1e-4 else 'FAIL'}")

    t_x = device_time(
        jax.vmap(lambda a, f: rf.warp_by_flow_tiled(a, f)), imgs, flows,
        iters=10)
    t_k = device_time(vk, imgs, flows, iters=10)
    print(f"warp 2x{H}x{W}x2: XLA block-gather {t_x*1e3:7.2f} ms   "
          f"pallas {t_k*1e3:7.2f} ms   speedup {t_x/t_k:.2f}x")

    # full-canvas (nowindow) finest-level shape class at the 36 MP
    # headline (4500x2000 solver res) with headline-scale flows -- the
    # r4 fidelity ladder caught the first-cut kernel corrupting output
    # at exactly this class while passing at 2000x1800
    H2, W2 = 2000, 4480
    yy, xx = np.mgrid[0:H2, 0:W2].astype(np.float32)
    fx2 = 60 * np.sin(yy / 97.0) + 25 * np.cos(xx / 211.0)
    fy2 = 30 * np.cos(yy / 83.0) - 12 * np.sin(xx / 157.0)
    flow2 = jnp.asarray(np.stack([fx2, fy2], -1))
    img2 = jnp.asarray(rng.standard_normal((H2, W2, 2)).astype(np.float32))
    ref2 = np.asarray(jax.jit(rf.warp_by_flow_tiled)(img2, flow2))
    got2 = np.asarray(jax.jit(kernels.warp_tiled_pallas)(img2, flow2))
    err2 = np.abs(ref2 - got2).max()
    nan2 = int(np.isnan(got2).sum())
    print(f"warp_tiled_pallas {H2}x{W2} big-flow: max err {err2:.2e} "
          f"nan {nan2} {'OK' if err2 < 1e-4 and nan2 == 0 else 'FAIL'}")


def main():
    if "--shardmap" in sys.argv:
        check_shardmap()

    if "--hybrid" in sys.argv:
        check_hybrid()
        return
    if "--fused" in sys.argv:
        check_fused()
        return
    if "--warp" in sys.argv:
        check_warp()
        return

    rng = np.random.default_rng(0)
    H, W = 512, 1024

    # ---- median ----
    x = rng.random((H, W), np.float32).astype(np.float32)
    ref = np.asarray(im.median5(jnp.asarray(x)))
    got = np.asarray(jax.jit(kernels.median5_pallas)(jnp.asarray(x)))
    err = np.abs(ref - got).max()
    print(f"median5: max err {err:.2e} {'OK' if err == 0 else 'FAIL'}")

    # ---- relax phase ----
    params = flow_params_by_name("pixflow_low")
    i0x = rng.standard_normal((H, W)).astype(np.float32) * 0.1
    i0y = rng.standard_normal((H, W)).astype(np.float32) * 0.1
    w1x = rng.standard_normal((H, W)).astype(np.float32) * 0.1
    w1y = rng.standard_normal((H, W)).astype(np.float32) * 0.1
    flow = rng.standard_normal((H, W, 2)).astype(np.float32) * 0.5
    f_base = flow + rng.standard_normal((H, W, 2)).astype(np.float32) * 0.2
    bf = rng.standard_normal((H, W, 2)).astype(np.float32) * 0.5
    mask = (rng.random((H, W)) > 0.1)

    w1g = jnp.stack([jnp.asarray(w1x), jnp.asarray(w1y)], -1)
    ref = np.asarray(jax.jit(
        lambda: rf.relax_phase_fast(
            jnp.asarray(flow), jnp.asarray(f_base), w1g,
            jnp.asarray(i0x), jnp.asarray(i0y), jnp.asarray(bf),
            jnp.asarray(mask), params, iters=3, D=3))())

    fx, fy = jax.jit(lambda: kernels.relax_phase_pallas(
        jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1]),
        jnp.asarray(f_base[..., 0]), jnp.asarray(f_base[..., 1]),
        jnp.asarray(w1x), jnp.asarray(w1y),
        jnp.asarray(i0x), jnp.asarray(i0y),
        jnp.asarray(bf[..., 0]), jnp.asarray(bf[..., 1]),
        jnp.asarray(mask.astype(np.float32)), params, 3, 3))()
    got = np.stack([np.asarray(fx), np.asarray(fy)], -1)
    err = np.abs(ref - got)
    # interior comparison (jnp path has image-global edge semantics the
    # tiled kernel approximates within its halo)
    inner = np.s_[8:-8, 8:-8]
    print(f"relax: max err inner {err[inner].max():.2e} "
          f"mean {err[inner].mean():.2e} "
          f"{'OK' if err[inner].max() < 1e-4 else 'FAIL'}")

    # ---- batched (direction-batched) parity: B=2 planes, one launch ----
    xb = rng.random((2, H, W)).astype(np.float32)
    refb = np.stack([np.asarray(im.median5(jnp.asarray(xb[i])))
                     for i in range(2)])
    gotb = np.asarray(jax.jit(kernels.median5_pallas)(jnp.asarray(xb)))
    err = np.abs(refb - gotb).max()
    print(f"median5 batched: max err {err:.2e} {'OK' if err == 0 else 'FAIL'}")

    def stack2(a):
        return np.stack([a, a[::-1]])  # second direction = flipped data

    fxb, fyb = jax.jit(lambda: kernels.relax_phase_pallas(
        *(jnp.asarray(stack2(a)) for a in (
            flow[..., 0], flow[..., 1], f_base[..., 0], f_base[..., 1],
            w1x, w1y, i0x, i0y, bf[..., 0], bf[..., 1],
            mask.astype(np.float32))), params, 3, 3))()
    gotb = np.stack([np.asarray(fxb), np.asarray(fyb)], -1)
    errb = np.abs(gotb[0] - ref)
    # direction 1 reference: everything flipped vertically
    w1g_f = jnp.stack([jnp.asarray(w1x[::-1]), jnp.asarray(w1y[::-1])], -1)
    ref1 = np.asarray(jax.jit(
        lambda: rf.relax_phase_fast(
            jnp.asarray(flow[::-1]), jnp.asarray(f_base[::-1]), w1g_f,
            jnp.asarray(i0x[::-1]), jnp.asarray(i0y[::-1]),
            jnp.asarray(bf[::-1]),
            jnp.asarray(mask[::-1]), params, iters=3, D=3))())
    errb1 = np.abs(gotb[1] - ref1)
    print(f"relax batched: max err inner b0 {errb[inner].max():.2e} "
          f"b1 {errb1[inner].max():.2e} "
          f"{'OK' if max(errb[inner].max(), errb1[inner].max()) < 1e-4 else 'FAIL'}")

    # ---- timing at 10 MP ----
    H2, W2 = 2048, 4992
    big = {k: rng.standard_normal((H2, W2)).astype(np.float32) * 0.2
           for k in "abcdefghij"}
    t = device_time(kernels.median5_pallas, big["a"], iters=10)
    print(f"median5_pallas 10MP:   {t*1e3:7.2f} ms")
    t = device_time(
        lambda fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy:
        kernels.relax_phase_pallas(fx, fy, bx, by, w1x, w1y, i0x, i0y,
                                   bfx, bfy, jnp.ones_like(fx), params,
                                   5, 3),
        *(big[k] for k in "abcdefghij"), iters=3)
    print(f"relax5_pallas 10MP:    {t*1e3:7.2f} ms "
          f"({t/5*1e3:.2f} ms/iter)")

    bigb = {k: rng.standard_normal((2, H2 // 2, W2)).astype(np.float32) * 0.2
            for k in "abcdefghij"}
    t = device_time(
        lambda fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy:
        kernels.relax_phase_pallas(fx, fy, bx, by, w1x, w1y, i0x, i0y,
                                   bfx, bfy, jnp.ones_like(fx), params,
                                   5, 3),
        *(bigb[k] for k in "abcdefghij"), iters=3)
    print(f"relax5_pallas 10MP batched(2x5MP): {t*1e3:7.2f} ms "
          f"({t/5*1e3:.2f} ms/iter)")

    # ---- tile sweep (halo-overlap amortisation vs VMEM headroom) ----
    for tile in ((64, 256), (64, 512), (128, 256), (128, 512), (256, 512)):
        try:
            t = device_time(
                lambda fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy:
                kernels.relax_phase_pallas(fx, fy, bx, by, w1x, w1y,
                                           i0x, i0y, bfx, bfy,
                                           jnp.ones_like(fx), params,
                                           5, 3, tile=tile),
                *(big[k] for k in "abcdefghij"), iters=3)
            print(f"relax5 tile {tile}: {t/5*1e3:7.2f} ms/iter")
        except Exception as e:  # noqa: BLE001
            print(f"relax5 tile {tile}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
