#!/bin/bash
# Round-start warm discipline (CLAUDE.md): re-warm the persistent XLA
# cache for the headline bench programs BEFORE any edit to
# panorama_opticalflow_tpu/ sources (the cache key is sensitive to
# source line numbers of traced code).  Serial: ONE TPU process at a
# time; never kill a run mid-compile (the remote compile service keeps
# the job and wedges the queue).
#
# Usage:  nohup tools/warm_cache.sh > /dev/null 2>&1 &
#         tail -f bench_warm.log
#
# Warm timings on the axon v5e tunnel (r3/r4 measurements):
#   cache fully valid:      ~1-4 min/process (executable reload)
#   cache cold (new edits): ~13-26 min for the default preset
set -u
cd "$(dirname "$0")/.."
{
  echo "=== warm $(date -u +%FT%TZ) entries=$(ls .cache/xla 2>/dev/null | wc -l)"
  # production default preset (what the driver's end-of-round bench runs)
  python bench.py
  # reference-parity preset (PANOSTITCH_BENCH_ALG=pixflow_low)
  PANOSTITCH_BENCH_ALG=pixflow_low python bench.py
  echo "=== warm done $(date -u +%FT%TZ)"
} >> bench_warm.log 2>&1
