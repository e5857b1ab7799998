"""Runtime initialisation: logging, crash handlers, timers, device setup.

TPU-native counterpart of the reference's initOpticalFlow
(CPU/util.cpp:48-120): glog -> Python logging, the terminate-handler +
12 signal handlers with backtrace() stack dumps -> faulthandler on the
same fatal signals, wall timers -> perf_counter, and additionally a
persistent XLA compilation cache (the TPU analogue of 'start fast').
"""

from __future__ import annotations

import contextlib
import faulthandler
import logging
import os
import signal
import time

log = logging.getLogger("panostitch")


def init_runtime(verbose: bool = True, compilation_cache: bool = True) -> None:
    """Install logging, fatal-signal stack dumps, and the XLA compile
    cache.  Safe to call more than once."""
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    faulthandler.enable()
    # the reference registers SIGABRT/SIGBUS/SIGFPE/SIGILL/SIGINT/SIGQUIT/
    # SIGSEGV/SIGTERM... (CPU/util.cpp:103-119); faulthandler covers the
    # fatal ones, register the rest for a stack dump without exiting.
    for sig in (signal.SIGTERM, signal.SIGQUIT):
        with contextlib.suppress((OSError, ValueError, RuntimeError)):
            faulthandler.register(sig, chain=True)
    if compilation_cache:
        # default inside the repo: /root/repo/.cache survives build rounds,
        # the home dir may not
        repo_cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".cache", "xla")
        cache_dir = os.environ.get("PANOSTITCH_CACHE", repo_cache)
        with contextlib.suppress(Exception):
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class StageTimer:
    """Per-part and total wall timing (CPU/main.cpp:62,103-108), plus
    jax.profiler hooks when PANOSTITCH_TRACE_DIR is set."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        trace_dir = os.environ.get("PANOSTITCH_TRACE_DIR")
        ctx = contextlib.nullcontext()
        if trace_dir:
            import jax

            ctx = jax.profiler.trace(os.path.join(trace_dir, name))
        t = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t
        self.stages.append((name, dt))
        log.info("%s finished! RUNTIME (sec) = %.3f", name, dt)

    def total(self) -> float:
        dt = time.perf_counter() - self.t0
        log.info("TotalRunTime (sec) = %.3f", dt)
        return dt
