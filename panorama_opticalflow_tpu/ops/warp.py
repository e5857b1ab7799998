"""Flow-guided sampling primitives.

Two samplers with the reference's exact boundary semantics:

* ``bilinear_extend``   -- clamp-to-edge bilinear used inside the flow
  error function (CPU/PixFlow.hpp:407-425): coordinates are clamped to
  [0, W-2] x [0, H-2] before taking the 2x2 cell.
* ``sample_nearest_wrap`` -- the novel-view point sampler
  (CPU/OpticalFlow.cpp:9-28): truncation to int, single horizontal wrap
  (the 360-degree canvas), vertical clamp.

Both are expressed as flat-index gathers; XLA lowers them to TPU gather
ops, and the Pallas relaxation kernel re-implements the bilinear variant
on VMEM-resident tiles for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_extend(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample ``img`` ((H, W) or (H, W, C) float32) at float coords.

    Matches getPixBilinear32FExtend: x clamped to [0, W-2], y to [0, H-2],
    corners at (x0, y0)..(x0+1, y0+1), standard bilinear weights.
    ``x``/``y`` may be any (broadcastable) shape; returns that shape
    (+ channel dim).
    """
    h, w = img.shape[:2]
    x = jnp.clip(x, 0.0, w - 2.0)
    y = jnp.clip(y, 0.0, h - 2.0)
    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    xr = x - x0.astype(x.dtype)
    yr = y - y0.astype(y.dtype)

    flat = img.reshape((h * w,) + img.shape[2:])
    base = y0 * w + x0
    f00 = jnp.take(flat, base, axis=0)
    f10 = jnp.take(flat, base + 1, axis=0)
    f01 = jnp.take(flat, base + w, axis=0)
    f11 = jnp.take(flat, base + w + 1, axis=0)
    if img.ndim == 3:
        xr = xr[..., None]
        yr = yr[..., None]
    return f00 + (f10 - f00) * xr + (f01 - f00) * yr \
        + (f00 + f11 - f10 - f01) * xr * yr


def sample_nearest_wrap(img: jax.Array, flow: jax.Array, t: jax.Array) -> jax.Array:
    """generateNovelViewPoint for every pixel (CPU/OpticalFlow.cpp:9-28).

    src = img[clamp_y(int(y + t*fy)), wrap_x(int(x + t*fx))] with C-style
    truncation toward zero, one-period horizontal wrap, vertical clamp.
    ``img`` is (H, W, C); ``flow`` is (H, W, 2) as (fx, fy); ``t`` is a
    scalar or (H, W) per-pixel factor.  Returns (H, W, C).
    """
    h, w = img.shape[:2]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    t = jnp.asarray(t, jnp.float32)
    sx = jnp.trunc(xs + flow[..., 0] * t).astype(jnp.int32)
    sy = jnp.trunc(ys + flow[..., 1] * t).astype(jnp.int32)
    # single wrap, exactly like the reference's two ifs
    sx = jnp.where(sx > w - 1, sx - w, sx)
    sx = jnp.where(sx < 0, sx + w, sx)
    sy = jnp.clip(sy, 0, h - 1)
    flat = img.reshape(h * w, -1)
    return jnp.take(flat, sy * w + sx, axis=0).reshape(img.shape)
