#!/usr/bin/env python
"""Mechanics probe for the round-5 kernels-outside-shard_map restructure.

Validates, on the 8-virtual-device CPU mesh:
  1. tiny shard_map halo-stack: (n*h, w) P(y) -> (n, h+2r, w) P(y)
  2. GSPMD batched compute on the stacked tiles (sharding preserved,
     no unexpected collectives)
  3. reshape (n, h, w) P(y) -> (n*h, w) P(y) stays local
  4. custom_partitioning with an Sdy sharding rule partitioning a
     stand-in "kernel" on the leading batch dim
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from functools import partial
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from jax.experimental.custom_partitioning import custom_partitioning

n = 8
mesh = Mesh(np.array(jax.devices()[:n]), ("y",))
h, w, r = 16, 32, 3
H = n * h

x = jnp.arange(H * w, dtype=jnp.float32).reshape(H, w)
xs = jax.device_put(x, NamedSharding(mesh, P("y")))


def exchange(loc):  # (h, w) -> (1, h+2r, w), reflect at global edges
    idx = jax.lax.axis_index("y")
    top = jax.lax.ppermute(loc[-r:], "y", [(d, d + 1) for d in range(n - 1)])
    bot = jax.lax.ppermute(loc[:r], "y", [(d + 1, d) for d in range(n - 1)])
    top = jnp.where(idx == 0, loc[1:r + 1][::-1], top)
    bot = jnp.where(idx == n - 1, loc[-r - 1:-1][::-1], bot)
    return jnp.concatenate([top, loc, bot], 0)[None]


halo_stack = shard_map(exchange, mesh=mesh, in_specs=P("y"),
                       out_specs=P("y"), check_vma=False)


# stand-in "kernel": batched elementwise+stencil-free op
def fake_kernel_impl(t):  # (B, hh, w)
    return t * 2.0 + 1.0


ck = custom_partitioning(fake_kernel_impl)


def _infer(mesh_, arg_shapes, result_shape):
    return NamedSharding(mesh_, P("y"))


def _partition(mesh_, arg_shapes, result_shape):
    arg_sh = tuple(NamedSharding(mesh_, P("y")) for _ in arg_shapes)
    out_sh = NamedSharding(mesh_, P("y"))
    return mesh_, fake_kernel_impl, out_sh, arg_sh


ck.def_partition(
    infer_sharding_from_operands=_infer,
    partition=_partition,
    sharding_rule="b h w -> b h w",
)


def try_cp():
    @jax.jit
    def g(xg):
        st = halo_stack(xg)              # (n, h+2r, w)
        out = ck(st)                     # cp kernel
        out = out[:, r:-r, :]            # crop halos (local)
        return out.reshape(H, w)         # merge back

    o = g(xs)
    ref = x * 2.0 + 1.0
    print("cp path max err:", float(jnp.max(jnp.abs(o - ref))))
    print("out sharding:", o.sharding)


def try_plain():
    @jax.jit
    def g(xg):
        st = halo_stack(xg)
        out = fake_kernel_impl(st)
        out = out[:, r:-r, :]
        return out.reshape(H, w)

    o = g(xg=xs)
    ref = x * 2.0 + 1.0
    print("plain path max err:", float(jnp.max(jnp.abs(o - ref))))
    print("out sharding:", o.sharding)
    # check halo content correctness on a middle tile
    st = jax.jit(halo_stack)(xs)
    st0 = np.asarray(st)
    ok = np.array_equal(st0[3], np.asarray(x)[3 * h - r:4 * h + r])
    print("halo rows exact (tile 3):", ok)


try_plain()
try_cp()
print("OK")
