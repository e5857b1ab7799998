#!/usr/bin/env python
"""Multi-HOST bring-up demo without pod hardware: two OS processes, each
with 4 virtual CPU devices, joined by jax.distributed into one 8-device
mesh running the row-tiled stitch (parallel/tiled.py) with cross-process
collectives.

This exercises the exact multi-host code path (parallel.mesh.
maybe_init_distributed via the standard JAX_COORDINATOR_* env vars,
global mesh construction, make_array_from_callback sharding, halo
exchange and distance-scan collectives crossing the process boundary)
that a >= 2-host TPU pod run would take; only the transport differs.

Run with no arguments: spawns both workers, waits, validates the
sharded result against the single-process pipeline (SSIM), prints one
JSON line.
"""

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

H, W = 128, 160
SEED = 11
NPROC = 2
DEVS_PER_PROC = 4


def worker(out_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    # the standard coordinator env vars are set by the parent; this is
    # the call a pod job makes on every host
    from panorama_opticalflow_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from panorama_opticalflow_tpu.models import pipeline
    from panorama_opticalflow_tpu.parallel import tiled
    from panorama_opticalflow_tpu.utils import io as pio
    from panorama_opticalflow_tpu.utils.config import StitchConfig

    n = len(jax.devices())
    assert n == NPROC * DEVS_PER_PROC, (n, jax.process_count())

    from functools import partial

    from jax import shard_map

    photos = pio.synthesize_four_input_set(H, W, seed=SEED)
    il, ir = (np.asarray(a) for a in pipeline.compose_four(
        jnp.stack([jnp.asarray(p) for p in photos])))

    mesh = Mesh(np.array(jax.devices()), ("y",))
    axis = "y"
    sh = NamedSharding(mesh, P(axis))

    # pre-pad rows to a mesh multiple on the host (tiled_stitch_pair
    # pads eagerly, which a multi-process global array cannot)
    hp = -(-H // n) * n
    pad = ((0, hp - H), (0, 0), (0, 0))

    def mk(global_np):
        g = np.pad(global_np, pad)
        return jax.make_array_from_callback(g.shape, sh,
                                            lambda idx: g[idx])

    cfg = StitchConfig()
    tc = tiled.TileConfig(min_tiled_rows=8, level_halo=32)
    body = partial(tiled._tiled_stitch_pair_body, cfg=cfg, axis=axis, n=n,
                   h_global=H, tc=tc)
    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                           out_specs=P(axis)))
    out = fn(mk(il), mk(ir))
    out_g = np.asarray(multihost_utils.process_allgather(
        out, tiled=True))[:H]

    if jax.process_index() == 0:
        np.save(os.path.join(out_dir, "sharded.npy"), out_g)
        # single-process baseline on this host
        ref = np.asarray(pipeline.stitch_pair(jnp.asarray(il),
                                              jnp.asarray(ir), cfg))
        np.save(os.path.join(out_dir, "ref.npy"), ref)


def main() -> int:
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return 0

    out_dir = tempfile.mkdtemp(prefix="panomp_")
    port = 12357
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": str(NPROC),
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (env.get("XLA_FLAGS", "") +
                          f" --xla_force_host_platform_device_count="
                          f"{DEVS_PER_PROC}"),
            "PYTHONPATH": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", out_dir],
            env=env))
    rcs = [p.wait(timeout=1200) for p in procs]
    if any(rcs):
        print(json.dumps({"ok": False, "rcs": rcs}))
        return 1

    import numpy as np

    out = np.load(os.path.join(out_dir, "sharded.npy"))
    ref = np.load(os.path.join(out_dir, "ref.npy"))
    from panorama_opticalflow_tpu.utils.metrics import ssim

    inner = np.s_[8:-8]
    s = float(ssim(out[inner], ref[inner]))
    frac_same = float((out[inner] == ref[inner]).mean())
    print(json.dumps({
        "ok": bool(s >= 0.995 and frac_same > 0.9),
        "processes": NPROC, "devices": NPROC * DEVS_PER_PROC,
        "canvas": f"{W}x{H}", "ssim_vs_single_process": round(s, 4),
        "frac_interior_bit_identical": round(frac_same, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
