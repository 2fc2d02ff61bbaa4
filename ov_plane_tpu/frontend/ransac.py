"""Gyro-aided two-point RANSAC for frame-to-frame outlier rejection.

The reference gates KLT matches with an 8-point fundamental-matrix RANSAC
(cv::findFundamentalMat in TrackPlane::perform_matching,
TrackPlane.cpp:1299-1357). A VIO system knows the inter-frame rotation from
the gyro, so the TPU-native design uses the stronger 2-point formulation:

    epipolar constraint with known R:  b2 · (t × R b1) = 0
                                       ⇔ t ⟂ m,  m = (R b1) × b2

Each correspondence pins t to a plane; two correspondences give a translation
hypothesis t ∝ m_i × m_j. RANSAC is fully vectorized: K fixed hypothesis
pairs (counter-derived, deterministic), inlier test |t̂ · m̂| < sin(thresh)
evaluated as one [K, N] matrix — no data-dependent loops, jit/vmap-safe.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RansacOptions(NamedTuple):
    num_hypotheses: int = 64
    thresh: float = 2e-3       # |t̂·m̂| threshold (≈ angular epipolar error, rad)
    min_inlier_ratio: float = 0.3


def _unit(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=("opts",))
def gyro_ransac(uvn1, uvn2, mask, R_1to2, opts: RansacOptions):
    """Classify correspondences as inliers of a rotation-compensated epipolar
    model.

    uvn1/uvn2: [N, 2] normalized coordinates in frames 1/2; mask: [N] valid;
    R_1to2: relative camera rotation (from gyro integration).
    Returns (inlier_mask [N], best_t [3], n_inliers).
    """
    N = uvn1.shape[0]
    b1 = _unit(jnp.concatenate([uvn1, jnp.ones((N, 1), uvn1.dtype)], axis=1))
    b2 = _unit(jnp.concatenate([uvn2, jnp.ones((N, 1), uvn2.dtype)], axis=1))
    m = jnp.cross(b1 @ R_1to2.T, b2)                     # [N, 3]
    m_norm = jnp.linalg.norm(m, axis=1)
    # Degenerate m (pure-rotation match, |m|≈0) satisfies any t: always inlier.
    degenerate = m_norm < 1e-6
    m_hat = m / jnp.maximum(m_norm, 1e-12)[:, None]

    # Deterministic hypothesis pairs spread over the valid set.
    K = opts.num_hypotheses
    idx = jnp.arange(N)
    order = jnp.argsort(~mask)                            # valid entries first
    n_valid = jnp.maximum(jnp.sum(mask), 2)
    h = jnp.arange(K)
    i1 = order[( (h * 2654435761) % n_valid ).astype(idx.dtype)]
    i2 = order[( (h * 40503 + 17) % n_valid ).astype(idx.dtype)]
    t_hyp = _unit(jnp.cross(m_hat[i1], m_hat[i2]))        # [K, 3]

    err = jnp.abs(t_hyp @ m_hat.T)                        # [K, N]
    ok = (err < opts.thresh) & mask[None, :] | (degenerate & mask)[None, :]
    scores = jnp.sum(ok, axis=1)
    best = jnp.argmax(scores)
    inliers = ok[best]
    n_in = scores[best]
    # Fall back to "all valid" when the model explains too few (e.g. t ≈ 0).
    ratio = n_in / jnp.maximum(jnp.sum(mask), 1)
    use = ratio >= opts.min_inlier_ratio
    inliers = jnp.where(use, inliers, mask)
    return inliers, t_hyp[best], n_in


def integrate_gyro(imu_t, imu_w, t0, t1, bg):
    """Relative rotation R_I0→I1 from gyro samples over [t0, t1] (masked scan)."""
    from ov_plane_tpu.ops.quat import exp_so3

    ta = jnp.clip(imu_t[:-1], t0, t1)
    tb = jnp.clip(imu_t[1:], t0, t1)
    dt = jnp.where(jnp.isfinite(tb - ta), jnp.maximum(tb - ta, 0.0), 0.0)

    def body(R, xs):
        w, d = xs
        dR = exp_so3(-(w - bg) * d)   # R_GtoI convention: R1 = exp(-wdt) R0
        return dR @ R, None

    R, _ = jax.lax.scan(body, jnp.eye(3, dtype=imu_w.dtype), (imu_w[:-1], dt))
    return R  # R maps I0 coords: R_I0toI1 = R (since R1 = R @ R0 → R_1 R_0ᵀ)
