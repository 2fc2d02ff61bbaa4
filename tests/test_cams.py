"""Camera model tests: distortion round-trips and autodiff-Jacobian checks
against hand-derived analytic formulas (reference: ov_core CamRadtan/CamEqui
compute_distort_jacobian, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.ops import cams

# EuRoC-like radtan camera.
ZETA_RADTAN = jnp.asarray([458.654, 457.296, 367.215, 248.375, -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
# Fisheye-ish equi camera (TUM-VI-like).
ZETA_EQUI = jnp.asarray([190.97847, 190.9733, 254.93170, 256.89742, 0.0034823894, 0.0007150348, -0.0020532361, 0.00020293673])

RNG = np.random.default_rng(3)


def _rand_norm_points(n, scale=0.5):
    return jnp.asarray(RNG.uniform(-scale, scale, size=(n, 2)))


def test_radtan_roundtrip():
    pts = _rand_norm_points(128)
    uv = jax.vmap(lambda p: cams.distort_norm(p, ZETA_RADTAN, cams.RADTAN))(pts)
    back = jax.vmap(lambda p: cams.undistort(p, ZETA_RADTAN, cams.RADTAN))(uv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-10)


def test_equi_roundtrip():
    pts = _rand_norm_points(128, scale=1.0)
    uv = jax.vmap(lambda p: cams.distort_norm(p, ZETA_EQUI, cams.EQUI))(pts)
    back = jax.vmap(lambda p: cams.undistort(p, ZETA_EQUI, cams.EQUI))(uv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-10)


def test_radtan_jacobian_analytic():
    """Autodiff Jacobian must equal the hand-derived radtan Jacobian."""
    p = jnp.asarray([0.21, -0.13])
    _, dz_dzn, dz_dzeta = cams.distort_jacobians(p, ZETA_RADTAN, cams.RADTAN)
    fx, fy = ZETA_RADTAN[0], ZETA_RADTAN[1]
    k1, k2, p1, p2 = ZETA_RADTAN[4], ZETA_RADTAN[5], ZETA_RADTAN[6], ZETA_RADTAN[7]
    x, y = p[0], p[1]
    r2 = x * x + y * y
    # Analytic (as in the reference's CamRadtan::compute_distort_jacobian).
    dxd_dx = 1 + k1 * r2 + k2 * r2**2 + 2 * k1 * x**2 + 4 * k2 * x**2 * r2 + 2 * p1 * y + 6 * p2 * x
    dxd_dy = 2 * k1 * x * y + 4 * k2 * x * y * r2 + 2 * p1 * x + 2 * p2 * y
    dyd_dx = 2 * k1 * x * y + 4 * k2 * x * y * r2 + 2 * p1 * x + 2 * p2 * y
    dyd_dy = 1 + k1 * r2 + k2 * r2**2 + 2 * k1 * y**2 + 4 * k2 * y**2 * r2 + 6 * p1 * y + 2 * p2 * x
    expected = np.asarray([[fx * dxd_dx, fx * dxd_dy], [fy * dyd_dx, fy * dyd_dy]])
    np.testing.assert_allclose(np.asarray(dz_dzn), expected, atol=1e-10)
    # d/d zeta spot checks: du/dfx = xd, du/dcx = 1, du/dk1 = fx*x*r2.
    radial = 1 + k1 * r2 + k2 * r2**2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    np.testing.assert_allclose(dz_dzeta[0, 0], xd, atol=1e-12)
    np.testing.assert_allclose(dz_dzeta[0, 2], 1.0, atol=1e-12)
    np.testing.assert_allclose(dz_dzeta[0, 4], fx * x * r2, atol=1e-12)


def test_jacobian_matches_finite_difference_equi():
    p = jnp.asarray([0.4, 0.3])
    _, dz_dzn, _ = cams.distort_jacobians(p, ZETA_EQUI, cams.EQUI)
    eps = 1e-7
    for i in range(2):
        dp = jnp.zeros(2).at[i].set(eps)
        fd = (cams.distort_norm(p + dp, ZETA_EQUI, cams.EQUI) - cams.distort_norm(p - dp, ZETA_EQUI, cams.EQUI)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dz_dzn)[:, i], np.asarray(fd), atol=1e-6)


def test_project():
    p_FinC = jnp.asarray([0.5, -0.3, 2.0])
    uv, uv_norm, depth = cams.project(p_FinC, ZETA_RADTAN, cams.RADTAN)
    np.testing.assert_allclose(np.asarray(uv_norm), [0.25, -0.15], atol=1e-12)
    assert depth == 2.0
    np.testing.assert_allclose(
        np.asarray(uv), np.asarray(cams.distort_norm(uv_norm, ZETA_RADTAN, cams.RADTAN)), atol=1e-12
    )
