"""Pallas TPU kernels for the hot pixflow ops.

Two kernels carry nearly all the solver's per-pixel work:

* ``median5_pallas`` -- 5x5 median via a Batcher sorting network on 25
  VMEM-resident shifted views (the XLA sort-based formulation is
  HBM-bandwidth-bound at ~40 ms / 10 MP; the network in VMEM is
  compute-bound at ~1-2 ms).
* ``relax_phase_pallas`` -- K Jacobi relaxation iterations per call, one
  HBM round trip per phase: each grid tile DMAs its halo window into
  VMEM and iterates propagation + descent entirely on-chip, using the
  same hat-window sampling formulation as ops/relax_fast.py (which is
  the jnp reference implementation of this kernel; the CPU test path
  runs that and the TPU path must match it).

Layout note: all arrays are channel-split 2-D (H, W) float32 -- a
trailing channel dim of 2 would make the TPU lane dimension 2 wide and
waste the VPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from panorama_opticalflow_tpu.utils.config import FlowParams

# Workaround for the axon-v5e Mosaic-in-shard_map miscompile (r3,
# probe_nan*_r3.log / tools/probe_nan_r4.py): kernels embedded in a
# LARGE manual-sharding (shard_map) program return 100% NaN while the
# identical kernels in a small program are bit-exact -- consistent with
# an XLA scheduling/buffer-reuse bug around the Mosaic custom-calls.
# An optimization_barrier fence on every kernel's operands and results
# pins their buffers against cross-kernel reordering; measured r4: this
# makes the full sharded solver bit-clean with kernels enabled at the
# shapes that previously NaN'd, at no measurable runtime cost.  Export
# PANOSTITCH_PALLAS_BARRIER=0 to disable (debugging only).
_BARRIER = os.environ.get("PANOSTITCH_PALLAS_BARRIER", "1") != "0"


def _fence(*arrays):
    """optimization_barrier passthrough (identity when disabled)."""
    if not _BARRIER:
        return arrays if len(arrays) != 1 else arrays[0]
    out = jax.lax.optimization_barrier(tuple(arrays))
    return out if len(arrays) != 1 else out[0]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def _ladder(ratio: float = 1.25, top: int = 4096) -> tuple[int, ...]:
    """Geometric ladder of tile counts: {ceil(ratio^k)} deduped."""
    vals, v = [], 1.0
    while v <= top:
        if not vals or int(-(-v // 1)) > vals[-1]:
            vals.append(int(-(-v // 1)))
        v *= ratio
    return tuple(vals)


def _bucket_tiles(g: int, bucket: bool) -> int:
    """Round a tile count up to the next ladder rung.

    Pyramid levels shrink by 0.9 per level; the 1.25 rung ratio makes
    ~2 adjacent levels share one padded shape, so their Pallas kernels
    serialize to identical Mosaic payloads and the TPU compiler's
    payload cache compiles each rung once instead of once per level.
    Outputs are bit-identical (padding is edge-replicated and cropped);
    the only cost is <= 25%/dim wasted compute on the smaller levels of
    a rung."""
    if not bucket:
        return g
    for v in _ladder():
        if v >= g:
            return v
    return g


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Batcher odd-even mergesort network (compare-exchange pairs for n = 2^k)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def batcher_pairs(n: int) -> tuple[tuple[int, int], ...]:
    assert n & (n - 1) == 0, "power of two"
    pairs = []
    k = 1
    while k < n:
        j = k
        while j >= 1:
            for i in range(n):
                ixj = i ^ j
                if ixj > i:
                    if (i & (k << 1)) == 0:
                        pairs.append((i, ixj))
                    else:
                        pairs.append((ixj, i))
            j >>= 1
        k <<= 1
    return tuple(pairs)


def _median25(vals: list):
    """Median of 25 equal-shape arrays via a padded 32-way Batcher sort."""
    inf = jnp.full_like(vals[0], jnp.inf)
    v = vals + [inf] * 7
    for a, b in batcher_pairs(32):
        lo = jnp.minimum(v[a], v[b])
        hi = jnp.maximum(v[a], v[b])
        v[a], v[b] = lo, hi
    return v[12]


# ---------------------------------------------------------------------------
# median5
# ---------------------------------------------------------------------------

_MED_TH, _MED_TW = 128, 512


def _median5_kernel(x_hbm, o_ref, x_vmem, sem):
    # DMA windows must be tiling-aligned (8, 128); read a slightly larger
    # aligned window and slice values in registers.
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    c = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * _MED_TH, _MED_TH + 8),
                 pl.ds(j * _MED_TW, _MED_TW + 128)], x_vmem, sem)
    c.start()
    c.wait()
    v = x_vmem[:, :]
    shifts = [v[dy:dy + _MED_TH, dx:dx + _MED_TW]
              for dy in range(5) for dx in range(5)]
    o_ref[0, :, :] = _median25(shifts)


def _median5_impl(x: jax.Array, bucket: bool) -> jax.Array:
    nb, h, w = x.shape
    gh = _bucket_tiles(_cdiv(h, _MED_TH), bucket)
    gw = _bucket_tiles(_cdiv(w, _MED_TW), bucket)
    hp, wp = gh * _MED_TH, gw * _MED_TW
    # replicate-pad 2 for the window plus aligned-window slack
    xp = jnp.pad(x, ((0, 0), (2, hp - h + 6), (2, wp - w + 126)), mode="edge")
    out = pl.pallas_call(
        _median5_kernel,
        grid=(nb, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, _MED_TH, _MED_TW), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_MED_TH + 8, _MED_TW + 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(_fence(xp))
    return _fence(out)[:, :h, :w]


@functools.lru_cache(maxsize=None)
def _median5_vmappable(bucket: bool):
    """custom_vmap wrapper: extra vmap dims fold into the kernel's
    leading grid dim (Mosaic rejects the default batched-BlockSpec rule
    for HBM-space pallas_calls)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(x):
        return _median5_impl(x, bucket)

    @f.def_vmap
    def _rule(axis_size, in_batched, x):
        if not in_batched[0]:
            return f(x), False
        inner = x.shape[1:]                       # (B, H, W)
        out = f(x.reshape((-1,) + inner[-2:]))
        return out.reshape((axis_size,) + inner), True

    return f


def median5_pallas(x: jax.Array, bucket: bool = True) -> jax.Array:
    """cv::medianBlur 5x5, BORDER_REPLICATE, for (H, W) or (B, H, W) f32
    planes.  A batch of planes (e.g. fx/fy of both flow directions) runs
    as one launch with a leading grid dimension; further ``jax.vmap``
    batch dims fold into that same grid dim (batched-panorama stitching
    composes).  ``bucket`` ladder-pads the grid so nearby shapes compile
    one shared Mosaic payload (bit-identical output, see
    _bucket_tiles)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    out = _median5_vmappable(bool(bucket))(x)
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# fused median5 + low-alpha diffusion
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _gauss_taps(ksize: int, sigma: float) -> tuple[float, ...]:
    """1-D Gaussian taps, identical to ops.image.gaussian_kernel_1d."""
    from panorama_opticalflow_tpu.ops.image import gaussian_kernel_1d

    return tuple(float(v) for v in gaussian_kernel_1d(ksize, sigma))


_MD_TH, _MD_TW = 64, 512


def _median5_diffuse_kernel(taps, x_hbm, c_hbm, o_ref, x_vmem, c_vmem,
                            sem, sem2):
    """out = c * gauss(med5(x)) + (1 - c) * med5(x) on one tile.

    The blur needs med on a +-(k//2) margin, med needs x on a further
    +-2; the window is read once and everything happens in VMEM."""
    k = len(taps)
    gr = k // 2
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * _MD_TH, _MD_TH + 24),
                 pl.ds(j * _MD_TW, _MD_TW + 128)], x_vmem, sem).start()
    pltpu.make_async_copy(
        c_hbm.at[b // 2, pl.ds(i * _MD_TH, _MD_TH),
                 pl.ds(j * _MD_TW, _MD_TW)], c_vmem, sem2).start()
    pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * _MD_TH, _MD_TH + 24),
                 pl.ds(j * _MD_TW, _MD_TW + 128)], x_vmem, sem).wait()
    pltpu.make_async_copy(
        c_hbm.at[b // 2, pl.ds(i * _MD_TH, _MD_TH),
                 pl.ds(j * _MD_TW, _MD_TW)], c_vmem, sem2).wait()

    v = x_vmem[:, :]
    # median over the tile + blur margin (rows/cols [2, TH/TW + 2gr + 2)
    # of the window = original [-gr, TH/TW + gr))
    mh, mw = _MD_TH + 2 * gr + 2, _MD_TW + 2 * gr + 2
    shifts = [v[dy:dy + mh, dx:dx + mw]
              for dy in range(5) for dx in range(5)]
    med = _median25(shifts)          # rows r <-> original row r - gr
    # separable blur of med
    acc = jnp.zeros((mh, _MD_TW), jnp.float32)
    for t in range(k):
        acc = acc + taps[t] * med[:, t:t + _MD_TW]
    blur = jnp.zeros((_MD_TH, _MD_TW), jnp.float32)
    for t in range(k):
        blur = blur + taps[t] * acc[t:t + _MD_TH, :]
    med_c = med[gr:gr + _MD_TH, gr:gr + _MD_TW]
    cv = c_vmem[:, :]
    o_ref[0, :, :] = cv * blur + (1.0 - cv) * med_c


def _median5_diffuse_impl(x: jax.Array, c: jax.Array, taps, bucket: bool
                          ) -> jax.Array:
    nb, h, w = x.shape
    gr = len(taps) // 2
    pad = gr + 2
    gh = _bucket_tiles(_cdiv(h, _MD_TH), bucket)
    gw = _bucket_tiles(_cdiv(w, _MD_TW), bucket)
    hp, wp = gh * _MD_TH, gw * _MD_TW
    xp = jnp.pad(x, ((0, 0), (pad, hp - h + 24 - pad),
                     (pad, wp - w + 128 - pad)), mode="edge")
    cp = jnp.pad(c, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    out = pl.pallas_call(
        functools.partial(_median5_diffuse_kernel, taps),
        grid=(nb, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec((1, _MD_TH, _MD_TW), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_MD_TH + 24, _MD_TW + 128), jnp.float32),
                        pltpu.VMEM((_MD_TH, _MD_TW), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )(*_fence(xp, cp))
    return _fence(out)[:, :h, :w]


@functools.lru_cache(maxsize=None)
def _median5_diffuse_vmappable(taps, bucket: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(x, c):
        return _median5_diffuse_impl(x, c, taps, bucket)

    @f.def_vmap
    def _rule(axis_size, in_batched, x, c):
        if not any(in_batched):
            return f(x, c), False
        xi = x.shape[1:] if in_batched[0] else x.shape
        ci = c.shape[1:] if in_batched[1] else c.shape

        def fold(a, b, inner):
            if not b:
                a = jnp.broadcast_to(a, (axis_size,) + a.shape)
            return a.reshape((-1,) + inner[-2:])

        # folded plane v*2B+p maps to c index (v*2B+p)//2 = v*B + p//2:
        # the pairing survives the fold
        out = f(fold(x, in_batched[0], xi), fold(c, in_batched[1], ci))
        return out.reshape((axis_size,) + xi), True

    return f


def median5_diffuse_pallas(x: jax.Array, c: jax.Array,
                           ksize: int = 15, sigma: float = 8.0,
                           bucket: bool = True) -> jax.Array:
    """Fused ``c * gauss_{ksize,sigma}(median5(x)) + (1-c) * median5(x)``
    -- the per-level median filter + low-alpha flow diffusion
    (CPU/PixFlow.hpp:325,339,388-405) in ONE HBM round trip instead of
    three (median write, blur read/write, lerp read).

    ``x`` is (2B, H, W) float32 flow planes where planes 2b and 2b+1 are
    the fx/fy of direction b; ``c`` is (B, H, W) diffusion coefficient
    (1 - a0*a1).  Extra jax.vmap dims fold into the leading grid dim.
    Border deviation: the blur sees edge-replicated (not reflect-101)
    content at the canvas border -- a <= ksize//2 px band, gated by the
    fused-vs-jnp interpret test and the e2e SSIM suites."""
    return _median5_diffuse_vmappable(_gauss_taps(ksize, sigma),
                                      bool(bucket))(x, c)


# ---------------------------------------------------------------------------
# relax phase
# ---------------------------------------------------------------------------


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dhat(t):
    return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)


def _relax_phase_impl(
    fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy, mask,
    params: FlowParams, iters: int, D: int, tile: tuple[int, int],
    fuse_bf: bool = False,
):
    def rup(a, m):
        return -(-a // m) * m

    nb, h, w = fx.shape
    th, tw = tile
    halo = iters + D + 2      # propagation + sampling contamination
    ps = D + 2                # sampling reach of the hat window
    gh = _bucket_tiles(_cdiv(h, th), params.pallas_bucket)
    gw = _bucket_tiles(_cdiv(w, tw), params.pallas_bucket)
    hp, wp = gh * th, gw * tw

    the = th + 2 * halo                    # logical extended tile
    twe = tw + 2 * halo
    the_a, twe_a = rup(the, 8), rup(twe + 2, 128)  # aligned windows
    # X accumulator covers rows [-(D+1), the_a+D+1) with alignment slack
    xr_a = rup(the + 2 * (D + 1), 8) + 8
    xw_a = twe_a + 128
    # warped-gradient window with slack for all static offsets
    thw_a, tww_a = xr_a + 16, xw_a + 128
    # fused blurred-flow: f_base windows carry a gr-larger halo so the
    # 15-tap separable blur can be computed in VMEM over the full
    # extended tile (one x-pass scratch row band of slack)
    gr = params.blurred_flow_kernel_width // 2
    the_b, twe_b = the_a + 2 * gr + 2, twe_a + 128

    def pad_to(a, top, height, width):
        return jnp.pad(a, ((0, 0), (top, height - top - a.shape[1]),
                           (top, width - top - a.shape[2])), mode="edge")

    ph_, pw_ = (gh - 1) * th + the_a, (gw - 1) * tw + twe_a
    if fuse_bf:
        assert bfx is None and bfy is None
        std = [pad_to(a, halo, ph_, pw_)
               for a in (fx, fy, i0x, i0y, mask)]
        ph_b, pw_b = (gh - 1) * th + the_b, (gw - 1) * tw + twe_b
        args = std[:2] + [pad_to(a, halo + gr, ph_b, pw_b)
                          for a in (bx, by)] + std[2:]
    else:
        args = [pad_to(a, halo, ph_, pw_)
                for a in (fx, fy, bx, by, i0x, i0y, bfx, bfy, mask)]
    phw, pww = (gh - 1) * th + thw_a, (gw - 1) * tw + tww_a
    w1_dt = jnp.bfloat16 if params.w1_bf16 else jnp.float32
    w1 = [pad_to(a, halo + ps, phw, pww).astype(w1_dt) for a in (w1x, w1y)]
    bf_taps = (_gauss_taps(params.blurred_flow_kernel_width,
                           params.blurred_flow_sigma) if fuse_bf else None)

    smooth = params.smoothness_coef
    step = params.gradient_step_size
    fold = params.fold_descent_sample
    lim = D - 1e-3
    # the reg coefficients carry the level width w; passing them in SMEM
    # (instead of baking w into the body) keeps the kernel payload
    # level-independent so bucketed shapes dedup Mosaic compiles
    regs = jnp.array([params.vertical_regularization_coef / w,
                      params.horizontal_regularization_coef / w], jnp.float32)

    def kernel(*refs):
        if fuse_bf:
            (fx_h, fy_h, bx_h, by_h, i0x_h, i0y_h, m_h,
             w1x_h, w1y_h, regs_r, ofx_r, ofy_r,
             fx_r, fy_r, bx_r, by_r, i0x_r, i0y_r, m_r,
             w1x_r, w1y_r, bfx_r, bfy_r, xg_r,
             xax_r, xay_r, gax_r, gay_r,
             s0x_r, s0y_r, sxpx_r, sxpy_r, sxmx_r, sxmy_r,
             sypx_r, sypy_r, symx_r, symy_r, sems) = refs
        else:
            (fx_h, fy_h, bx_h, by_h, i0x_h, i0y_h, bfx_h, bfy_h, m_h,
             w1x_h, w1y_h, regs_r, ofx_r, ofy_r,
             fx_r, fy_r, bx_r, by_r, i0x_r, i0y_r, bfx_r, bfy_r, m_r,
             w1x_r, w1y_r,
             xax_r, xay_r, gax_r, gay_r,
             s0x_r, s0y_r, sxpx_r, sxpy_r, sxmx_r, sxmy_r,
             sypx_r, sypy_r, symx_r, symy_r, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        y0 = i * th
        x0 = j * tw
        if fuse_bf:
            std = ((fx_h, fx_r), (fy_h, fy_r), (i0x_h, i0x_r),
                   (i0y_h, i0y_r), (m_h, m_r))
            big = ((bx_h, bx_r), (by_h, by_r))
        else:
            std = ((fx_h, fx_r), (fy_h, fy_r), (bx_h, bx_r),
                   (by_h, by_r), (i0x_h, i0x_r), (i0y_h, i0y_r),
                   (bfx_h, bfx_r), (bfy_h, bfy_r), (m_h, m_r))
            big = ()
        copies = []
        for src, dst in std:
            c = pltpu.make_async_copy(
                src.at[b, pl.ds(y0, the_a), pl.ds(x0, twe_a)], dst,
                sems.at[len(copies)])
            c.start()
            copies.append(c)
        for src, dst in big:
            c = pltpu.make_async_copy(
                src.at[b, pl.ds(y0, the_b), pl.ds(x0, twe_b)], dst,
                sems.at[len(copies)])
            c.start()
            copies.append(c)
        for src, dst in ((w1x_h, w1x_r), (w1y_h, w1y_r)):
            c = pltpu.make_async_copy(
                src.at[b, pl.ds(y0, thw_a), pl.ds(x0, tww_a)], dst,
                sems.at[len(copies)])
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

        if fuse_bf:
            # blurred-flow regularisation target computed in VMEM from
            # the f_base windows (separable 15-tap passes) -- replaces
            # the level's XLA blur HBM round trip
            for src_r, out_r in ((bx_r, bfx_r), (by_r, bfy_r)):
                sv = src_r[:, :]
                acc = jnp.zeros((the_b, twe_a), jnp.float32)
                for t, tap in enumerate(bf_taps):
                    acc = acc + tap * sv[:, t:t + twe_a]
                xg_r[:, :] = acc
                xv = xg_r[:, :]
                acc2 = jnp.zeros((the_a, twe_a), jnp.float32)
                for t, tap in enumerate(bf_taps):
                    acc2 = acc2 + tap * xv[t:t + the_a, :]
                out_r[:, :] = acc2

        vreg_w = regs_r[0]
        hreg_w = regs_r[1]

        def err_terms(sx, sy, cfx, cfy, i0xb, i0yb, bfxb, bfyb):
            d0 = i0xb - sx
            d1 = i0yb - sy
            data = jnp.sqrt(d0 * d0 + d1 * d1)
            fdx = bfxb - cfx
            fdy = bfyb - cfy
            sm = jnp.sqrt(fdx * fdx + fdy * fdy)
            return (data + smooth * sm
                    + vreg_w * jnp.abs(cfy) + hreg_w * jnp.abs(cfx))

        def roll2(a, dy_, dx_):
            out = a
            if dy_ > 0:
                out = jnp.concatenate([out[:1]] * dy_ + [out[:-dy_]], 0)
            elif dy_ < 0:
                out = jnp.concatenate([out[-dy_:]] + [out[-1:]] * (-dy_), 0)
            if dx_ > 0:
                out = jnp.concatenate([out[:, :1]] * dx_ + [out[:, :-dx_]], 1)
            elif dx_ < 0:
                out = jnp.concatenate([out[:, -dx_:]] + [out[:, -1:]] * (-dx_), 1)
            return out

        def ext_to(a, height, width, top, left):
            """edge-extend a to (height, width) with a's origin at
            (top, left)."""
            bot = height - top - a.shape[0]
            right = width - left - a.shape[1]
            if top:
                a = jnp.concatenate([a[:1]] * top + [a], 0)
            if bot:
                a = jnp.concatenate([a] + [a[-1:]] * bot, 0)
            if left:
                a = jnp.concatenate([a[:, :1]] * left + [a], 1)
            if right:
                a = jnp.concatenate([a] + [a[:, -1:]] * right, 1)
            return a

        def x_pass(dxf, weight_fn, outx_r, outy_r):
            """X(r,c) = sum_ox weight_fn(dx - ox)(r,c) * W1[r, c+ox],
            computed over the full aligned scratch shape (scatter-free:
            everything full-ref-sized; out-of-logical regions hold
            harmless garbage).  X row r <-> flow row r-(D+1); X col c <->
            flow col c-1."""
            dxe = ext_to(dxf, xr_a, xw_a, D + 1, 1)
            outx_r[:, :] = jnp.zeros((xr_a, xw_a), jnp.float32)
            outy_r[:, :] = jnp.zeros((xr_a, xw_a), jnp.float32)
            w1xv = w1x_r[:, :]
            w1yv = w1y_r[:, :]
            for ox in range(-D, D + 1):
                wgt = weight_fn(dxe - ox)               # (xr_a, xw_a)
                vx = w1xv[1:1 + xr_a, ps - 1 + ox:ps - 1 + ox + xw_a] \
                    .astype(jnp.float32)
                vy = w1yv[1:1 + xr_a, ps - 1 + ox:ps - 1 + ox + xw_a] \
                    .astype(jnp.float32)
                outx_r[:, :] = outx_r[:, :] + wgt * vx
                outy_r[:, :] = outy_r[:, :] + wgt * vy

        def y_pass(dyf, weight_fn, inx_r, iny_r, srefs_rows_cols):
            """each (ref_x, ref_y, row_off, col_off): accumulate
            sum_oy weight_fn(dy-oy) * X[r+oy+row_off, c+col_off]."""
            dye = ext_to(dyf, the_a, twe_a, 0, 0)
            for rx, ry, ro, co in srefs_rows_cols:
                rx[:, :] = jnp.zeros((the_a, twe_a), jnp.float32)
                ry[:, :] = jnp.zeros((the_a, twe_a), jnp.float32)
            xv = inx_r[:, :]
            yv = iny_r[:, :]
            for oy in range(-D, D + 1):
                wgt = weight_fn(dye - oy)                # (the_a, twe_a)
                for rx, ry, ro, co in srefs_rows_cols:
                    r0 = D + 1 + oy + ro
                    c0 = 1 + co
                    vx = xv[r0:r0 + the_a, c0:c0 + twe_a]
                    vy = yv[r0:r0 + the_a, c0:c0 + twe_a]
                    rx[:, :] = rx[:, :] + wgt * vx
                    ry[:, :] = ry[:, :] + wgt * vy

        def body(_, __):
            fxb = fx_r[:, :][:the, :twe]
            fyb = fy_r[:, :][:the, :twe]
            if fuse_bf:
                # f_base window carries a gr-larger halo; shift origin
                bxb = bx_r[:, :][gr:gr + the, gr:gr + twe]
                byb = by_r[:, :][gr:gr + the, gr:gr + twe]
            else:
                bxb = bx_r[:, :][:the, :twe]
                byb = by_r[:, :][:the, :twe]
            dx = jnp.clip(fxb - bxb, -lim, lim)
            dy = jnp.clip(fyb - byb, -lim, lim)

            # ---- pass A ----
            x_pass(dx, _hat, xax_r, xay_r)
            y_pass(dy, _hat, xax_r, xay_r,
                   ((s0x_r, s0y_r, 0, 0),
                    (sxpx_r, sxpy_r, 0, 1), (sxmx_r, sxmy_r, 0, -1),
                    (sypx_r, sypy_r, 1, 0), (symx_r, symy_r, -1, 0)))

            i0xb = i0x_r[:, :][:the, :twe]
            i0yb = i0y_r[:, :][:the, :twe]
            bfxb = bfx_r[:, :][:the, :twe]
            bfyb = bfy_r[:, :][:the, :twe]
            best_fx, best_fy = fxb, fyb
            best_sx = s0x_r[:, :][:the, :twe]
            best_sy = s0y_r[:, :][:the, :twe]
            best_e = err_terms(best_sx, best_sy,
                               fxb, fyb, i0xb, i0yb, bfxb, bfyb)
            for (srx, sry, dy_, dx_) in (
                    (sxpx_r, sxpy_r, 0, 1),    # from left
                    (sypx_r, sypy_r, 1, 0),    # from up
                    (sxmx_r, sxmy_r, 0, -1),   # from right
                    (symx_r, symy_r, -1, 0)):  # from down
                cfx = roll2(fxb, dy_, dx_)
                cfy = roll2(fyb, dy_, dx_)
                csx = roll2(srx[:, :][:the, :twe], dy_, dx_)
                csy = roll2(sry[:, :][:the, :twe], dy_, dx_)
                e = err_terms(csx, csy,
                              cfx, cfy, i0xb, i0yb, bfxb, bfyb)
                take = e < best_e
                best_fx = jnp.where(take, cfx, best_fx)
                best_fy = jnp.where(take, cfy, best_fy)
                best_e = jnp.where(take, e, best_e)
                if fold:
                    best_sx = jnp.where(take, csx, best_sx)
                    best_sy = jnp.where(take, csy, best_sy)

            # ---- pass B: descent at the accepted flow ----
            dx2 = jnp.clip(best_fx - bxb, -lim, lim)
            dy2 = jnp.clip(best_fy - byb, -lim, lim)
            x_pass(dx2, _hat, xax_r, xay_r)
            x_pass(dx2, _dhat, gax_r, gay_r)
            if fold:
                # the accepted candidate's sample (tracked above) IS the
                # descent residual sample; Gy from hat-X, Gx from dhat-X
                y_pass(dy2, _dhat, xax_r, xay_r, ((sypx_r, sypy_r, 0, 0),))
                y_pass(dy2, _hat, gax_r, gay_r, ((sxpx_r, sxpy_r, 0, 0),))
                s2x, s2y = best_sx, best_sy
            else:
                # S2 and Gy from hat-X; Gx from dhat-X
                y_pass(dy2, _hat, xax_r, xay_r, ((s0x_r, s0y_r, 0, 0),))
                y_pass(dy2, _dhat, xax_r, xay_r, ((sypx_r, sypy_r, 0, 0),))
                y_pass(dy2, _hat, gax_r, gay_r, ((sxpx_r, sxpy_r, 0, 0),))
                s2x = s0x_r[:, :][:the, :twe]
                s2y = s0y_r[:, :][:the, :twe]
            gyx = sypx_r[:, :][:the, :twe]
            gyy = sypy_r[:, :][:the, :twe]
            gxx = sxpx_r[:, :][:the, :twe]
            gxy = sxpy_r[:, :][:the, :twe]

            d0 = i0xb - s2x
            d1 = i0yb - s2y
            q = jnp.sqrt(d0 * d0 + d1 * d1)
            inv_q = jnp.where(q > 1e-12, 1.0 / q, 0.0)
            ddx = -(d0 * gxx + d1 * gxy) * inv_q
            ddy = -(d0 * gyx + d1 * gyy) * inv_q
            fdx = bfxb - best_fx
            fdy = bfyb - best_fy
            sv = jnp.sqrt(fdx * fdx + fdy * fdy)
            inv_s = jnp.where(sv > 1e-12, 1.0 / sv, 0.0)
            gx = ddx + smooth * (-fdx * inv_s) \
                + hreg_w * jnp.sign(best_fx)
            gy = ddy + smooth * (-fdy * inv_s) \
                + vreg_w * jnp.sign(best_fy)
            mb = m_r[:, :][:the, :twe]
            nfx = jnp.where(mb > 0, best_fx - step * gx, fxb)
            nfy = jnp.where(mb > 0, best_fy - step * gy, fyb)
            fx_r[:, :] = ext_to(nfx, the_a, twe_a, 0, 0)
            fy_r[:, :] = ext_to(nfy, the_a, twe_a, 0, 0)
            return 0

        jax.lax.fori_loop(0, iters, body, 0)
        ofx_r[0, :, :] = fx_r[:, :][halo:halo + th, halo:halo + tw]
        ofy_r[0, :, :] = fy_r[:, :][halo:halo + th, halo:halo + tw]

    if fuse_bf:
        scratch = (
            [pltpu.VMEM((the_a, twe_a), jnp.float32)] * 2      # fx fy
            + [pltpu.VMEM((the_b, twe_b), jnp.float32)] * 2    # bx by
            + [pltpu.VMEM((the_a, twe_a), jnp.float32)] * 3    # i0x i0y m
            + [pltpu.VMEM((thw_a, tww_a), w1_dt)] * 2
            + [pltpu.VMEM((the_a, twe_a), jnp.float32)] * 2    # bfx bfy
            + [pltpu.VMEM((the_b, twe_a), jnp.float32)]        # blur x-pass
            + [pltpu.VMEM((xr_a, xw_a), jnp.float32)] * 4
            + [pltpu.VMEM((the_a, twe_a), jnp.float32)] * 10
            + [pltpu.SemaphoreType.DMA((9,))]
        )
        n_in = 9
    else:
        scratch = (
            [pltpu.VMEM((the_a, twe_a), jnp.float32)] * 9
            + [pltpu.VMEM((thw_a, tww_a), w1_dt)] * 2
            + [pltpu.VMEM((xr_a, xw_a), jnp.float32)] * 4
            + [pltpu.VMEM((the_a, twe_a), jnp.float32)] * 10
            + [pltpu.SemaphoreType.DMA((11,))]
        )
        n_in = 11
    out_fx, out_fy = pl.pallas_call(
        kernel,
        grid=(nb, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_in
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((1, th, tw), lambda b, i, j: (b, i, j),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb, hp, wp), jnp.float32)] * 2,
        scratch_shapes=scratch,
    )(*_fence(*args, *w1, regs))
    out_fx, out_fy = _fence(out_fx, out_fy)
    return out_fx[:, :h, :w], out_fy[:, :h, :w]


@functools.lru_cache(maxsize=None)
def _relax_phase_vmappable(params: FlowParams, iters: int, D: int,
                           tile: tuple[int, int], fuse_bf: bool = False):
    """custom_vmap wrapper: extra vmap dims fold into the kernel's
    leading grid dim, so ``jax.vmap(stitch_pair)`` composes with the
    Pallas path (the default batched-BlockSpec rule fails Mosaic
    lowering for HBM-space pallas_calls)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(*planes):
        if fuse_bf:
            fx, fy, bx, by, w1x, w1y, i0x, i0y, mask = planes
            return _relax_phase_impl(fx, fy, bx, by, w1x, w1y, i0x, i0y,
                                     None, None, mask, params=params,
                                     iters=iters, D=D, tile=tile,
                                     fuse_bf=True)
        return _relax_phase_impl(*planes, params=params, iters=iters,
                                 D=D, tile=tile)

    @f.def_vmap
    def _rule(axis_size, in_batched, *planes):
        if not any(in_batched):
            return f(*planes), (False, False)
        inner = next(p.shape[1:]
                     for p, b in zip(planes, in_batched) if b)  # (B, H, W)

        def fold(p, b):
            if not b:
                p = jnp.broadcast_to(p, (axis_size,) + p.shape)
            return p.reshape((-1,) + inner[-2:])

        ofx, ofy = f(*[fold(p, b) for p, b in zip(planes, in_batched)])
        oshape = (axis_size,) + inner
        return (ofx.reshape(oshape), ofy.reshape(oshape)), (True, True)

    return f


def relax_phase_pallas(
    fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy, mask,
    params: FlowParams, iters: int, D: int,
    tile: tuple[int, int] = (64, 256), fuse_bf: bool = False,
):
    """K relaxation iterations on channel-split planes.

    All inputs (H, W) or batched (B, H, W) float32 (mask: 1.0 where
    updatable).  Returns (fx', fy') of the input shape.  A batch (the
    two flow directions of a stitch pair) runs as one launch with a
    leading grid dimension; further ``jax.vmap`` dims (batched-panorama
    stitching) fold into that same grid dim via a custom batching rule.
    Semantics match ops.relax_fast.relax_phase_fast (the separable
    hat-sampling formulation).

    Implementation notes (hard-won on v5e Mosaic):
      * the hat window is evaluated separably -- an x-pass accumulates
        ``X(r,c) = sum_ox hat(dx(r,c)-ox) * W1[r, c+ox]`` into scratch,
        then each sample map is a y-pass over X -- turning (2D+1)^2
        fused reads into 2(2D+1);
      * every accumulator lives in a VMEM scratch *ref*: large SSA
        temporaries inside the iteration loop each get their own stack
        slab and blow the 16 MB scoped-vmem limit;
      * DMA windows are padded to the (8, 128) tiling.

    With ``fuse_bf`` the blurred-flow regularisation target is computed
    inside the kernel from the f_base planes (``bfx``/``bfy`` must be
    None): valid when f_base IS the flow the target blurs, i.e.
    single-phase schedules.
    """
    squeeze = fx.ndim == 2
    if fuse_bf:
        assert bfx is None and bfy is None
        planes = [fx, fy, bx, by, w1x, w1y, i0x, i0y, mask]
    else:
        planes = [fx, fy, bx, by, w1x, w1y, i0x, i0y, bfx, bfy, mask]
    if squeeze:
        planes = [a[None] for a in planes]
    out_fx, out_fy = _relax_phase_vmappable(
        params, int(iters), int(D), tuple(tile), bool(fuse_bf))(*planes)
    if squeeze:
        return out_fx[0], out_fy[0]
    return out_fx, out_fy


# ---------------------------------------------------------------------------
# flow-guided warp (per-phase gradient recentring)
# ---------------------------------------------------------------------------
#
# The XLA formulation (ops/relax_fast.warp_by_flow_tiled) spends most of
# its ~15 ms/level-pair at the 36 MP headline's finest level in the
# vmapped ~1k-block dynamic_slice gather and the (ty, tx, c, th, tw) ->
# (c, hp, wp) layout shuffle, not in the hat-pass arithmetic
# (flowlevel_r3.log).  Here each grid tile DMAs its input window directly
# at a runtime offset (the tile's rounded mean flow, precomputed by one
# cheap XLA reduce and passed through SMEM) and applies the separable
# residual hat passes in VMEM -- one HBM round trip, no gather, no
# shuffle.
#
# Toolchain constraint (probe_nan_r4_top.log): Mosaic requires dynamic
# DMA starts to be PROVABLY divisible by the (8, 128) tiling -- an
# arbitrary per-tile offset DMA fails to lower.  So the window is
# fetched at the floored-aligned start and BOTH remainders are peeled
# in VMEM with exact integer shifts: the row remainder (0..7) by a
# sublane shift (selection matmul / non-negative rotate, same strategy
# knob as below), the column remainder (0..127) likewise on the lane
# axis -- 0/1 selection matmuls on the MXU by default (exact,
# ~40 MFLOP/tile ~= 1 us).


# Remainder peel strategy: "matmul" (default) uses exact 0/1 selection
# matmuls on the MXU; "roll" uses the Mosaic dynamic rotate
# (pltpu.roll).  Both are exact integer shifts in interpret mode, but
# the hardware dynamic rotate is only correct at power-of-two window
# widths on this toolchain (bit-exact at the (64,256) tile's 512-wide
# window, err ~7 at the (64,128) tile's 384-wide window,
# check_warp_128.log) -- the matmul peel has no such constraint and is
# hardware-validated bit-exact (tools/check_pallas.py --warp).
_WARP_XSHIFT = os.environ.get("PANOSTITCH_WARP_XSHIFT", "matmul")


def _warp_tiled_impl(img: jax.Array, flow: jax.Array, tile: tuple[int, int],
                     margin: int, max_off: int) -> jax.Array:
    """img (B, H, W, C) warped by flow (B, H, W, 2) -> (B, H, W, C).

    Per-(th, tw) tile: integer offset = clip(rint(mean flow)); bilinear
    residual via two separable hat passes, clamp-to-edge -- the math of
    ops/relax_fast.warp_by_flow_tiled with the kernel's (th, tw) grid as
    the tile decomposition."""
    nb, h, w, c = img.shape
    th, tw = tile
    ty, tx = _cdiv(h, th), _cdiv(w, tw)
    hp, wp = ty * th, tx * tw

    planes = jnp.pad(jnp.moveaxis(img, 3, 1).reshape(nb * c, h, w),
                     ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    flow_p = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                     mode="edge")
    mean = flow_p.reshape(nb, ty, th, tx, tw, 2).mean(axis=(2, 4))
    off = jnp.clip(jnp.rint(mean), -max_off, max_off).astype(jnp.int32)

    pad = max_off + margin + 1
    bh = th + 2 * margin + 1 + 7      # window rows incl. row remainder
    bw = tw + 2 * margin + 1          # logical window cols
    bh_a = -(-bh // 8) * 8
    bw_a = -(-(bw + 127) // 128) * 128  # cols incl. col remainder
    if _WARP_XSHIFT == "roll" and (bw_a & (bw_a - 1)) != 0:
        # the Mosaic dynamic lane rotate is only bit-exact at
        # power-of-two widths on this toolchain (check_warp_128.log:
        # max err 7.08 at the 384-wide window) -- selecting it here
        # would silently corrupt the warp
        raise ValueError(
            f"PANOSTITCH_WARP_XSHIFT=roll needs a power-of-two aligned "
            f"window width, got {bw_a} (tile {tile}); use the default "
            f"matmul peel")
    # padded-coords DMA start ranges: rows [0, hp - th + pad + max_off
    # - margin] floored to 8; cols likewise floored to 128.  Pad the
    # bottom/right so the largest window stays in bounds.
    pad_b = (hp - th + pad + max_off - margin) // 8 * 8 + bh_a \
        - hp - pad
    pad_r = (wp - tw + pad + max_off - margin) // 128 * 128 + bw_a \
        - wp - pad
    big = jnp.pad(planes, ((0, 0), (pad, max(pad_b, 0)),
                           (pad, max(pad_r, 0))), mode="edge")
    fx = flow_p[..., 0]
    fy = flow_p[..., 1]
    lim = margin - 1e-3

    def kernel(big_h, fx_h, fy_h, off_s, o_ref,
               win_r, xwin_r, fxt_r, fyt_r, accx_r, accy_r, sems):
        p = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        b = p // c
        # offsets are passed FLAT: multi-dim SMEM windows are padded per
        # dim by Mosaic (a (32,8,9,2) i32 window allocated 2 MB and blew
        # the 1 MB SMEM limit at batch 16 -- bench_r4_batched16.log)
        base = ((b * ty + i) * tx + j) * 2
        oy = off_s[base + 1]
        ox = off_s[base]
        ys = i * th + oy + pad - margin
        xs = j * tw + ox + pad - margin
        ys_al = pl.multiple_of(ys - jax.lax.rem(ys, 8), 8)
        xs_al = pl.multiple_of(xs - jax.lax.rem(xs, 128), 128)
        ry_rem = ys - ys_al                    # 0..7
        rx_rem = xs - xs_al                    # 0..127
        cw = pltpu.make_async_copy(
            big_h.at[p, pl.ds(ys_al, bh_a), pl.ds(xs_al, bw_a)],
            win_r, sems.at[0])
        cw.start()
        cx = pltpu.make_async_copy(
            fx_h.at[b, pl.ds(i * th, th), pl.ds(j * tw, tw)],
            fxt_r, sems.at[1])
        cx.start()
        cy = pltpu.make_async_copy(
            fy_h.at[b, pl.ds(i * th, th), pl.ds(j * tw, tw)],
            fyt_r, sems.at[2])
        cy.start()
        cw.wait()
        cx.wait()
        cy.wait()

        # resolve the alignment remainders with exact integer shifts, so
        # xwin[r, q] == image[ys + r, xs + q] (the window the unaligned
        # DMA would have fetched): dynamic sublane/lane rotates, or 0/1
        # selection matmuls on the MXU as the fallback strategy
        if _WARP_XSHIFT == "roll":
            # negative SUBLANE rotates miscompile on this toolchain
            # (tools/probe_roll.py: lane +-s and sublane +s are exact,
            # sublane -s is wrong) -- use the non-negative equivalent
            ry_up = jax.lax.rem(bh_a - ry_rem, bh_a)
            shifted = pltpu.roll(pltpu.roll(win_r[:, :], ry_up, axis=0),
                                 -rx_rem, axis=1)
            xwin_r[:, :] = shifted[:, :bw_a - 128]
        else:
            hi = jax.lax.Precision.HIGHEST
            r_io = jax.lax.broadcasted_iota(jnp.int32, (bh_a, bh_a), 0)
            k_io = jax.lax.broadcasted_iota(jnp.int32, (bh_a, bh_a), 1)
            sel_r = (k_io == r_io + ry_rem).astype(jnp.float32)
            rows = jax.lax.dot(sel_r, win_r[:, :], precision=hi)
            k2_io = jax.lax.broadcasted_iota(jnp.int32, (bw_a, bw_a - 128), 0)
            c_io = jax.lax.broadcasted_iota(jnp.int32, (bw_a, bw_a - 128), 1)
            sel_c = (k2_io == c_io + rx_rem).astype(jnp.float32)
            xwin_r[:, :] = jax.lax.dot(rows, sel_c, precision=hi)

        rx = jnp.clip(fxt_r[:, :] - ox.astype(jnp.float32), -lim, lim)
        ry = jnp.clip(fyt_r[:, :] - oy.astype(jnp.float32), -lim, lim)
        # rx edge-extended over the window rows (residual is smooth
        # within a tile): rows [-margin, th + margin], plus alignment
        # slack rows (computed but never read by the y-pass)
        rx_ext = jnp.concatenate([rx[:1]] * margin + [rx]
                                 + [rx[-1:]] * (margin + 8 + bh_a - bh), 0)
        wv = xwin_r[:, :]
        accx_r[:, :] = jnp.zeros((bh_a, tw), jnp.float32)
        for oxi in range(-margin, margin + 1):
            wgt = _hat(rx_ext - oxi)                     # (bh_a, tw)
            sl = wv[:, margin + oxi:margin + oxi + tw]
            accx_r[:, :] = accx_r[:, :] + wgt * sl
        av = accx_r[:, :]
        accy_r[:, :] = jnp.zeros((th, tw), jnp.float32)
        for oyi in range(-margin, margin + 1):
            wgt = _hat(ry - oyi)                         # (th, tw)
            sl = av[margin + oyi:margin + oyi + th, :]
            accy_r[:, :] = accy_r[:, :] + wgt * sl
        o_ref[0, :, :] = accy_r[:, :]

    out = pl.pallas_call(
        kernel,
        grid=(nb * c, ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, th, tw), lambda p, i, j: (p, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * c, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bh_a, bw_a), jnp.float32),
                        pltpu.VMEM((bh_a, bw_a - 128), jnp.float32),
                        pltpu.VMEM((th, tw), jnp.float32),
                        pltpu.VMEM((th, tw), jnp.float32),
                        pltpu.VMEM((bh_a, tw), jnp.float32),
                        pltpu.VMEM((th, tw), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
    )(*_fence(big, fx, fy, off.reshape(-1)))
    out = _fence(out)[:, :h, :w]
    return jnp.moveaxis(out.reshape(nb, c, h, w), 1, 3)


@functools.lru_cache(maxsize=None)
def _warp_tiled_vmappable(c: int, tile: tuple[int, int], margin: int,
                          max_off: int):
    """custom_vmap wrapper: extra vmap dims (the two flow directions of
    a batched pair solve, further batched-panorama dims) fold into the
    kernel's leading grid dimension."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(img, flow):
        return _warp_tiled_impl(img, flow, tile, margin, max_off)

    @f.def_vmap
    def _rule(axis_size, in_batched, img, flow):
        ii = img.shape[1:] if in_batched[0] else img.shape    # (B, H, W, C)
        fi = flow.shape[1:] if in_batched[1] else flow.shape

        def fold(a, b, inner):
            if not b:
                a = jnp.broadcast_to(a, (axis_size,) + a.shape)
            return a.reshape((-1,) + inner[-3:])

        out = f(fold(img, in_batched[0], ii), fold(flow, in_batched[1], fi))
        return out.reshape((axis_size,) + ii), True

    return f


def warp_tiled_pallas(img: jax.Array, flow: jax.Array,
                      tile: tuple[int, int] = (64, 128), margin: int = 8,
                      max_off: int = 96) -> jax.Array:
    """W(x) = img(x + flow(x)), bilinear, clamp-to-edge -- the Pallas
    twin of ops/relax_fast.warp_by_flow_tiled (same per-tile
    integer-offset + separable-hat-residual math, with the kernel grid
    as the tile decomposition).  ``img`` is (H, W, C) or (B, H, W, C)
    float32, ``flow`` (…, H, W, 2).  Extra jax.vmap dims fold into the
    leading grid dim.

    The default tile MATCHES warp_by_flow_tiled's (64, 128), making the
    kernel bit-compatible with the jnp production path (hardware-checked
    in tools/check_pallas.py --warp), so every fidelity gate of the XLA
    warp transfers.  A first cut used (64, 256) -- 2.06x the XLA warp vs
    ~1.7x here -- but the coarser per-tile integer offsets clamp larger
    residuals and measurably diverge at large-flow canvases
    (tiled_overhead 4500x2000 SSIM 0.927 vs the jnp path, r4 probes);
    the finer grid buys that accuracy back for ~1 ms at the headline's
    finest level."""
    squeeze = img.ndim == 3
    if squeeze:
        img, flow = img[None], flow[None]
    out = _warp_tiled_vmappable(int(img.shape[-1]), tuple(tile),
                                int(margin), int(max_off))(img, flow)
    return out[0] if squeeze else out
