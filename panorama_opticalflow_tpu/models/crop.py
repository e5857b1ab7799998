"""Overlap-aware flow cropping.

The reference computes dense flow over the entire (wrap-extended) canvas
(CPU/OpticalFlow.cpp:102-145) even though the solver only updates pixels
where both alphas exceed 0.9 and the merged novel view is transparent
wherever either warped sample lands outside the overlap footprint
(CPU/OpticalFlow.cpp:50-52).  The final composite therefore depends on
flow values only within a margin of the overlap band.

Here the flow runs on a cropped column window: the minimal circular
(x-wrapping) column interval covering the overlap plus a margin and the
cols/20 continuity extension, rolled to be contiguous and bucketed to a
static width so jit compiles a small set of shapes.  Flow outside the
window is zero, which leaves the composite unchanged (samples stay in
place and hit transparent pixels).

The column window is data-dependent: the caller computes it on the host
from a tiny per-column reduction (one scalar-vector fetch per pair);
everything else stays jitted.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from panorama_opticalflow_tpu.ops import image as im
from panorama_opticalflow_tpu.utils.config import StitchConfig

# Window widths are quantised up to multiples of this (and floored at
# 2x) so jit compiles a small set of shapes that recur across pairs and
# runs.  256 keeps the waste bounded by 255 columns; the previous coarse
# fractional ladder (0.25/0.375/0.5/... of the canvas) overshot the
# 9000x4000 headline's 3477-column requirement to 4608 -- 25% of the
# window area (and of the flows/blend/combine stages) computed for
# nothing.
_WIDTH_QUANTUM = 256


@jax.jit
def overlap_columns(canvas_map: jax.Array) -> jax.Array:
    """Tiny device reduction: per-column 'has overlap' flags."""
    return (canvas_map == 150).any(axis=0)


def circular_interval(cols: np.ndarray, margin: int) -> tuple[int, int] | None:
    """Smallest circular interval [start, start+length) covering all True
    columns, grown by ``margin``.  None when no overlap exists."""
    w = cols.shape[0]
    idx = np.flatnonzero(cols)
    if idx.size == 0:
        return None
    if idx.size == w:
        return 0, w
    # largest gap of False columns determines the complement
    ext = np.concatenate([idx, idx[:1] + w])
    gaps = np.diff(ext)
    g = int(np.argmax(gaps))
    start = int(ext[g + 1] % w)          # first True after the largest gap
    length = w - int(gaps[g] - 1)        # covered span
    start = (start - margin) % w
    length = min(w, length + 2 * margin)
    return start, length


def choose_bucket(length: int, w: int) -> int:
    bw = max(2 * _WIDTH_QUANTUM, -(-length // _WIDTH_QUANTUM) * _WIDTH_QUANTUM)
    return w if bw >= w else bw


def crop_window(canvas_map_np: np.ndarray | jax.Array, cfg: StitchConfig,
                margin: int = 64) -> tuple[int, int]:
    """Host-side: (roll, width) such that rolling the canvas left by
    ``roll`` makes columns [0, width) cover overlap+margin+extension.
    width == W means no crop."""
    cols = np.asarray(overlap_columns(jnp.asarray(canvas_map_np)))
    h, w = canvas_map_np.shape[:2]
    return _window_from_cols(cols, cfg, margin, blend_step(h, w, cfg))


@jax.jit
def _chain_overlap_columns(alphas_l: jax.Array, alpha_top: jax.Array):
    """Per-pair overlap-column flags for the iterative 6-input chain.

    Pair i stitches L = photos[i] against R = the accumulated panorama,
    whose footprint is exactly the union of the top photo and photos
    0..i-1 (the composite only ever fills where some input had alpha,
    CPU/StitchTool.cpp:52-96).  That makes every pair's overlap window
    computable from the *inputs* alone -- one tiny device program and a
    single host fetch up front instead of a blocking per-pair sync.

    alphas_l: (N, H, W) bool L footprints; alpha_top: (H, W) bool.
    Returns (N, W) bool: columns where pair i's canvas map has overlap.
    """
    def step(acc, al):
        cols = (al & acc).any(axis=0)
        return acc | al, cols

    _, cols = jax.lax.scan(step, alpha_top, alphas_l)
    return cols


def plan_chain_windows(photos: list[jax.Array], top: jax.Array,
                       cfg: StitchConfig, margin: int = 64
                       ) -> list[tuple[int, int, bool]]:
    """Host-side: (roll, width, gather_safe) crop windows for all pairs
    of the 6-input iterative chain, from one batched column reduction."""
    alphas = jnp.stack([p[..., 3] > 0 for p in photos])
    cols = np.asarray(_chain_overlap_columns(alphas, top[..., 3] > 0))
    h, w = top.shape[:2]
    step = blend_step(h, w, cfg)
    windows = []
    for i in range(cols.shape[0]):
        roll, width = _window_from_cols(cols[i], cfg, margin, step)
        safe = gather_window_safe(cols[i], roll, width,
                                  cfg.gather_search_radius)
        windows.append((roll, width, safe))
    return windows


def gather_window_safe(cols: np.ndarray, roll: int, width: int,
                       radius: int) -> bool:
    """True when gather_composite may run its hole search on the
    (roll, width) window bit-identically: every overlap column must sit
    >= radius inside the window (rays are bounded by radius) and
    >= radius away from the true canvas x-edges (full-canvas rays stop
    there; windowed rays would wrap across the rolled seam)."""
    w = cols.shape[0]
    if width >= w:
        return False  # whole canvas: window buys nothing
    idx = np.flatnonzero(cols)
    if idx.size == 0:
        return True   # no overlap -> no code==150 pixels -> hole unused
    if cols[:radius].any() or cols[w - radius:].any():
        return False
    p = (idx - roll) % w
    return bool((p >= radius).all() and (p <= width - 1 - radius).all())


def pair_window(canvas_map, cfg: StitchConfig, margin: int = 64
                ) -> tuple[int, int, bool]:
    """Host-side: (roll, width, gather_safe) for one pair (one tiny
    device fetch)."""
    cols = np.asarray(overlap_columns(jnp.asarray(canvas_map)))
    h, w = canvas_map.shape[:2]
    roll, width = _window_from_cols(cols, cfg, margin, blend_step(h, w, cfg))
    safe = gather_window_safe(cols, roll, width, cfg.gather_search_radius)
    return roll, width, safe


def blend_step(h: int, w: int, cfg: StitchConfig) -> int:
    """Selective-smoothing block stride (CPU/StitchTool.cpp:121)."""
    return max(1, min(h, w) // cfg.blend_step_div)


def _window_from_cols(cols: np.ndarray, cfg: StitchConfig,
                      margin: int, step: int = 1) -> tuple[int, int]:
    """(roll, width) covering overlap+margin+extension; ``roll`` is
    aligned down to a multiple of ``step`` (the blend block stride) so
    the windowed blend field's selective-smoothing grid matches the
    full-canvas block grid; the bucket gets step-1 extra slack so
    alignment never clips the required coverage."""
    w = cols.shape[0]
    ext = w // cfg.flow_extend_div
    iv = circular_interval(cols, margin + ext)
    if iv is None:
        return 0, choose_bucket(1, w)
    start, length = iv
    width = choose_bucket(length + step - 1, w)
    if width >= w:
        return 0, w
    slack = (width - length - step + 1) // 2
    s = (start - slack) % w
    return s - s % step, width


def cropped_flows_window(image_l: jax.Array, image_r: jax.Array, roll,
                         width: int, cfg: StitchConfig):
    """Bidirectional flow on the rolled column window; returns the
    window-sized flows (callers composing on the window use these
    directly).  Falls back to the full wrap-extended path when the
    window is the whole canvas."""
    from panorama_opticalflow_tpu.models.pixflow import compute_optical_flow_pair

    h, w = image_l.shape[:2]
    if width >= w:
        from panorama_opticalflow_tpu.models.novel_view import prepare_flows

        return prepare_flows(image_l, image_r, cfg)
    roll = jnp.asarray(roll)
    rl = jnp.roll(image_l, -roll, axis=1)[:, :width]
    rr = jnp.roll(image_r, -roll, axis=1)[:, :width]
    return compute_optical_flow_pair(rl, rr, cfg.flow_params, "left", "right")
