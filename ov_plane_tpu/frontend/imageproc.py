"""Image preprocessing: global histogram equalization and CLAHE.

The reference applies ``cv::equalizeHist`` or ``cv::CLAHE`` before tracking
(TrackPlane::feed_new_camera, TrackPlane.cpp:63-81; ``histogram_method``
config). Both are implemented as pure JAX ops on [H, W] float images in
[0, 1]: histograms via one-hot bincount, CLAHE as clip-limited per-tile
equalization with bilinear interpolation between tile mappings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NONE = 0
HISTOGRAM = 1
CLAHE = 2


def _cdf_map(hist, clip_limit=None):
    """Histogram [B] → equalization lookup [B] in [0, 1]."""
    if clip_limit is not None:
        excess = jnp.sum(jnp.maximum(hist - clip_limit, 0.0))
        hist = jnp.minimum(hist, clip_limit) + excess / hist.shape[0]
    cdf = jnp.cumsum(hist)
    total = jnp.maximum(cdf[-1], 1.0)
    cdf_min = cdf[jnp.argmax(hist > 0)]
    return jnp.clip((cdf - cdf_min) / jnp.maximum(total - cdf_min, 1.0), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("bins",))
def equalize_hist(img, bins: int = 256):
    """Global histogram equalization (cv::equalizeHist equivalent)."""
    q = jnp.clip((img * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[q.ravel()].add(1.0)
    lut = _cdf_map(hist)
    return lut[q]


@functools.partial(jax.jit, static_argnames=("tiles", "bins", "clip"))
def clahe(img, tiles: int = 8, bins: int = 64, clip: float = 4.0):
    """Clip-limited adaptive histogram equalization (cv::CLAHE equivalent).

    tiles×tiles grid; per-tile clipped equalization maps, bilinearly
    interpolated per pixel between the four surrounding tile centers.
    """
    H, W = img.shape
    th, tw = H // tiles, W // tiles
    Hc, Wc = th * tiles, tw * tiles
    imgc = img[:Hc, :Wc]
    q = jnp.clip((imgc * (bins - 1)).astype(jnp.int32), 0, bins - 1)

    # Per-tile histograms: [tiles, tiles, bins].
    tq = q.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3).reshape(tiles, tiles, th * tw)
    onehot = jax.nn.one_hot(tq, bins, dtype=jnp.float32)
    hists = jnp.sum(onehot, axis=2)
    clip_limit = clip * (th * tw) / bins
    luts = jax.vmap(jax.vmap(lambda h: _cdf_map(h, clip_limit)))(hists)  # [T, T, B]

    # Bilinear interpolation between tile-center mappings.
    yy = (jnp.arange(Hc) + 0.5) / th - 0.5
    xx = (jnp.arange(Wc) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    def sample(ty, tx):
        return luts[ty[:, None], tx[None, :], q]

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    out = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx + v10 * fy * (1 - fx) + v11 * fy * fx
    # Paste back into the full frame (edges beyond the tile grid untouched).
    return img.at[:Hc, :Wc].set(out.astype(img.dtype))


def preprocess(img, method: int):
    if method == HISTOGRAM:
        return equalize_hist(img)
    if method == CLAHE:
        return clahe(img)
    return img
