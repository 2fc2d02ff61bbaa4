"""FAST corner detection with grid-based selection, fully vectorized.

Replaces the reference's OpenCV FAST + Grider_FAST usage
(TrackPlane::perform_detection_monocular, TrackPlane.cpp:1173-1297): the
segment test runs as 16 shifted-image comparisons with a circular contiguous-
run test, scores are summed absolute differences, and the reference's grid
occupancy logic (grid_x × grid_y cells, min_px_dist spacing, top corner per
cell) becomes a per-cell max reduction plus masked top-k.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (OpenCV FAST-16 ring), (dy, dx) — a Python
# tuple: the offsets are compile-time constants for the shifted slices.
_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


class FastOptions(NamedTuple):
    threshold: float = 15.0 / 255.0   # intensity threshold (images in [0,1])
    arc: int = 9                      # FAST-9
    grid_x: int = 20
    grid_y: int = 20
    max_features: int = 250


def _ring_stack(img):
    """[16, H, W] of the ring-shifted image (edge-padded)."""
    pad = 3
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")
    H, W = img.shape

    return jnp.stack([x[pad + dy : pad + dy + H, pad + dx : pad + dx + W] for dy, dx in _RING])


@functools.partial(jax.jit, static_argnames=("opts",))
def fast_score_map(img, opts: FastOptions):
    """Per-pixel FAST corner score (0 where not a corner)."""
    ring = _ring_stack(img)                      # [16, H, W]
    center = img[None]
    brighter = ring > center + opts.threshold
    darker = ring < center - opts.threshold

    def has_arc(mask16):
        # Circular contiguous run ≥ arc: AND over `arc` consecutive wrapped entries.
        wrapped = jnp.concatenate([mask16, mask16[: opts.arc - 1]], axis=0)  # [16+arc-1, H, W]
        windows = jnp.stack([wrapped[k : k + 16] for k in range(opts.arc)])  # [arc, 16, H, W]
        return jnp.any(jnp.all(windows, axis=0), axis=0)

    is_corner = has_arc(brighter) | has_arc(darker)
    score = jnp.sum(jnp.abs(ring - center), axis=0)
    score = jnp.where(is_corner, score, 0.0)
    # Suppress borders.
    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    ok = (yy >= 4) & (yy < H - 4) & (xx >= 4) & (xx < W - 4)
    return jnp.where(ok, score, 0.0)


@functools.partial(jax.jit, static_argnames=("opts", "h", "w"))
def detect_grid(img, occupied_uv, occupied_mask, opts: FastOptions, h: int, w: int):
    """Detect up to max_features corners, one per grid cell, avoiding occupied
    locations (existing tracks), strongest first.

    occupied_uv: [O, 2] existing feature pixels; occupied_mask: [O].
    Returns (uv [max_features, 2], valid [max_features]).
    """
    score = fast_score_map(img, opts)

    # Mask out cells near existing features (min-px-dist via cell occupancy).
    gx, gy = opts.grid_x, opts.grid_y
    cw = w / gx
    ch = h / gy
    occ_cx = jnp.clip((occupied_uv[:, 0] / cw).astype(jnp.int32), 0, gx - 1)
    occ_cy = jnp.clip((occupied_uv[:, 1] / ch).astype(jnp.int32), 0, gy - 1)
    occ_cell = jnp.zeros((gy, gx), bool).at[occ_cy, occ_cx].max(occupied_mask)

    # Per-cell argmax via reshape (requires h % gy == 0 handled by cropping).
    hh = (h // gy) * gy
    ww = (w // gx) * gx
    cellH, cellW = hh // gy, ww // gx
    s = score[:hh, :ww].reshape(gy, cellH, gx, cellW).transpose(0, 2, 1, 3).reshape(gy, gx, cellH * cellW)
    best = jnp.argmax(s, axis=2)
    best_score = jnp.take_along_axis(s, best[..., None], axis=2)[..., 0]
    by = best // cellW
    bx = best % cellW
    u = (jnp.arange(gx)[None, :] * cellW + bx).astype(score.dtype)
    v = (jnp.arange(gy)[:, None] * cellH + by).astype(score.dtype)

    cand_score = jnp.where(occ_cell | (best_score <= 0), -1.0, best_score).ravel()
    # One detection per grid cell: k cannot exceed the cell count.
    k = min(opts.max_features, gy * gx)
    order_scores, order = jax.lax.top_k(cand_score, k)
    uv = jnp.stack([u.ravel()[order], v.ravel()[order]], axis=1)
    return uv, order_scores > 0
