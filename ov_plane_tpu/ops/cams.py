"""Camera projection/distortion models (radtan and equidistant-fisheye).

Functional equivalents of the reference's camera surface (ov_core
``CamBase/CamRadtan/CamEqui`` — see SURVEY.md §2.3: ``undistort_cv``,
``distort_d/f``, ``compute_distort_jacobian``), redesigned for JAX:

* a camera is just its parameter vector ``zeta = [fx, fy, cx, cy, d0..d3]``
  plus a static model tag (RADTAN / EQUI) — no classes, no state;
* distortion Jacobians (both w.r.t. normalized coordinates and w.r.t. the
  intrinsics, needed for online calibration) come from ``jax.jacfwd`` on the
  closed-form distortion map instead of hand-derived chain rules;
* undistortion is a fixed-iteration Newton solve under ``lax.scan`` (static
  trip count, jit/vmap-safe), replacing OpenCV's iterative undistort.

All functions operate on single points; batch with ``jax.vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

RADTAN = 0
EQUI = 1


def distort_norm(uv_norm, zeta, model: int):
    """Distort normalized coordinates -> pixel coordinates. (2,), (8,) -> (2,)."""
    x, y = uv_norm[0], uv_norm[1]
    fx, fy, cx, cy = zeta[0], zeta[1], zeta[2], zeta[3]
    if model == RADTAN:
        k1, k2, p1, p2 = zeta[4], zeta[5], zeta[6], zeta[7]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    elif model == EQUI:
        k1, k2, k3, k4 = zeta[4], zeta[5], zeta[6], zeta[7]
        r = jnp.sqrt(x * x + y * y)
        # Guard r→0: the distortion scale → 1 there.
        r_safe = jnp.where(r < 1e-8, 1.0, r)
        theta = jnp.arctan(r_safe)
        theta_d = theta * (1.0 + k1 * theta**2 + k2 * theta**4 + k3 * theta**6 + k4 * theta**8)
        scale = jnp.where(r < 1e-8, 1.0, theta_d / r_safe)
        xd = x * scale
        yd = y * scale
    else:  # pragma: no cover - static config error
        raise ValueError(f"unknown camera model {model}")
    return jnp.stack([fx * xd + cx, fy * yd + cy])


@functools.partial(jax.jit, static_argnames=("model",))
def distort_jacobians(uv_norm, zeta, model: int):
    """Return (uv_dist, d(uv)/d(uv_norm) [2,2], d(uv)/d(zeta) [2,8])."""
    uv = distort_norm(uv_norm, zeta, model)
    dz_dzn = jax.jacfwd(distort_norm, argnums=0)(uv_norm, zeta, model)
    dz_dzeta = jax.jacfwd(distort_norm, argnums=1)(uv_norm, zeta, model)
    return uv, dz_dzn, dz_dzeta


@functools.partial(jax.jit, static_argnames=("model", "iters"))
def undistort(uv_dist, zeta, model: int, iters: int = 20):
    """Pixel coordinates -> normalized coordinates via fixed-iteration Newton.

    Equivalent role to the reference's ``undistort_cv`` (OpenCV iterative
    undistortion), but a static-shape Newton solve on the exact forward model.
    """
    fx, fy, cx, cy = zeta[0], zeta[1], zeta[2], zeta[3]
    x0 = jnp.stack([(uv_dist[0] - cx) / fx, (uv_dist[1] - cy) / fy])

    def body(x, _):
        f = distort_norm(x, zeta, model) - uv_dist
        J = jax.jacfwd(distort_norm, argnums=0)(x, zeta, model)
        # 2x2 solve, explicit inverse (guarded determinant).
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = jnp.stack(
            [
                (J[1, 1] * f[0] - J[0, 1] * f[1]) / det,
                (-J[1, 0] * f[0] + J[0, 0] * f[1]) / det,
            ]
        )
        return x - dx, None

    x, _ = jax.lax.scan(body, x0, None, length=iters)
    return x


def project(p_FinC, zeta, model: int):
    """Perspective-project a 3D point in the camera frame to distorted pixels.

    Returns (uv_dist[2], uv_norm[2], depth). Depth ≤ 0 means invalid (caller masks).
    """
    depth = p_FinC[2]
    z_safe = jnp.where(jnp.abs(depth) < 1e-8, 1e-8, depth)
    uv_norm = jnp.stack([p_FinC[0] / z_safe, p_FinC[1] / z_safe])
    return distort_norm(uv_norm, zeta, model), uv_norm, depth
