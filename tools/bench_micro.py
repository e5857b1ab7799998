#!/usr/bin/env python
"""Device-side microbenchmarks.

The axon tunnel has high host<->device transfer latency, so wall-clock
around a single dispatch mismeasures device compute badly.  Here each
op runs inside a device-side lax.fori_loop (dependency-chained via a
dummy scalar perturbation) and only a scalar leaves the device; the
loop is long enough that tunnel latency is negligible.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def device_time(fn, *args, iters=20) -> float:
    """Seconds per iteration of fn(*args) measured with a device loop."""

    def loop(eps, args):
        def body(i, carry):
            eps, args = carry
            # dtype-preserving perturbation: ties args to the loop carry
            # without promoting integer inputs to f32
            out = fn(*jax.tree.map(
                lambda a: a + (eps * 0).astype(a.dtype), args))
            # fold output into eps so iterations chain
            s = jax.tree.reduce(
                lambda acc, x: acc + jnp.sum(x[..., :1, :1].astype(jnp.float32)),
                out, jnp.float32(0)) if isinstance(out, tuple) else \
                jnp.sum(out[..., :1, :1].astype(jnp.float32))
            return eps + 0e-30 * s, args

        eps, _ = jax.lax.fori_loop(0, iters, body, (eps, args))
        return eps

    jl = jax.jit(loop)
    args = jax.tree.map(jnp.asarray, args)
    # compile
    _ = float(jl(jnp.float32(0), args))
    t0 = time.time()
    r = float(jl(jnp.float32(0), args))
    dt = time.time() - t0
    return dt / iters


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")
    H, W = 2048, 4992
    x = np.random.rand(H, W).astype(np.float32)
    x2 = np.random.rand(H, W, 2).astype(np.float32)
    dx = ((np.random.rand(H, W) - 0.5) * 5).astype(np.float32)
    dy = ((np.random.rand(H, W) - 0.5) * 5).astype(np.float32)

    t = device_time(lambda a: a + 1.0, x)
    print(f"add 40MB:        {t*1e3:7.2f} ms  {80e6/t/1e9:6.0f} GB/s")

    t = device_time(lambda a: sum(jnp.roll(a, k, 0) for k in range(10)), x)
    print(f"10 shifts 40MB:  {t*1e3:7.2f} ms  {11*40e6/t/1e9:6.0f} GB/s")

    y = np.random.rand(2048, 2048).astype(np.float32)
    t = device_time(lambda a: a @ a, y)
    print(f"matmul 2048^3:   {t*1e3:7.2f} ms  {2*2048**3/t/1e12:6.1f} TF/s")

    from panorama_opticalflow_tpu.ops import image as im
    t = device_time(im.median5, x2)
    print(f"median5 10MPx2:  {t*1e3:7.2f} ms")
    t = device_time(lambda a: im.gaussian_blur(a, 15, 8.0), x2)
    print(f"gauss15 10MPx2:  {t*1e3:7.2f} ms")

    def hat_sample(img, dx, dy, D=3):
        dxc = jnp.clip(dx, -D + 1e-3, D - 1e-3)
        dyc = jnp.clip(dy, -D + 1e-3, D - 1e-3)
        p = jnp.pad(img, ((D, D), (D, D), (0, 0)), mode="edge")
        h, w = dx.shape
        acc = jnp.zeros_like(img)
        for oy in range(-D, D + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyc - oy))
            row = jax.lax.slice(p, (oy + D, 0, 0), (oy + D + h, w + 2 * D, 2))
            for ox in range(-D, D + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - ox))
                sh = jax.lax.slice(row, (0, ox + D, 0), (h, ox + D + w, 2))
                acc = acc + (wy * wx)[..., None] * sh
        return acc

    t = device_time(hat_sample, x2, dx, dy, iters=5)
    print(f"hat_sample D=3:  {t*1e3:7.2f} ms")

    flat = x2.reshape(-1, 2)
    idx = np.random.randint(0, H * W, (H, W)).astype(np.int32)
    t = device_time(lambda f, i: jnp.take(f, i, axis=0), flat, idx, iters=3)
    print(f"flat gather:     {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
