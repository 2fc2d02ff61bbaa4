"""Gyro-aided 2-point RANSAC tests."""

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend.ransac import RansacOptions, gyro_ransac, integrate_gyro
from ov_plane_tpu.ops.quat import exp_so3

RNG = np.random.default_rng(31)


def _make_scene(n=60, n_out=10):
    # Camera 1 at origin; camera 2 rotated+translated.
    w = np.array([0.03, -0.05, 0.02])
    R_1to2 = np.asarray(exp_so3(jnp.asarray(-w)))  # arbitrary small rotation
    t = np.array([0.2, 0.05, -0.1])
    pts = RNG.uniform([-2, -2, 3], [2, 2, 8], size=(n, 3))
    b1 = pts / pts[:, 2:3]
    p2 = (R_1to2 @ pts.T).T + t
    b2 = p2 / p2[:, 2:3]
    uvn1 = b1[:, :2]
    uvn2 = b2[:, :2].copy()
    # Outliers: corrupt the last n_out matches.
    uvn2[-n_out:] += RNG.uniform(0.05, 0.2, size=(n_out, 2)) * RNG.choice([-1, 1], size=(n_out, 2))
    return uvn1, uvn2, R_1to2, n_out


def test_ransac_rejects_outliers():
    uvn1, uvn2, R, n_out = _make_scene()
    n = len(uvn1)
    inl, t_best, n_in = gyro_ransac(
        jnp.asarray(uvn1), jnp.asarray(uvn2), jnp.ones(n, bool), jnp.asarray(R),
        RansacOptions(thresh=1e-3),
    )
    inl = np.asarray(inl)
    # All inlier matches kept, all corrupted ones dropped.
    assert inl[: n - n_out].mean() > 0.95, inl[: n - n_out].mean()
    assert inl[-n_out:].sum() <= 1, inl[-n_out:]


def test_ransac_pure_rotation_keeps_all():
    # No translation: every match is degenerate (m ≈ 0) → keep all valid.
    w = np.array([0.1, 0.05, -0.08])
    R = np.asarray(exp_so3(jnp.asarray(w)))
    pts = RNG.uniform([-2, -2, 3], [2, 2, 8], size=(40, 3))
    b1 = pts / pts[:, 2:3]
    p2 = (R @ pts.T).T
    b2 = p2 / p2[:, 2:3]
    inl, _, _ = gyro_ransac(
        jnp.asarray(b1[:, :2]), jnp.asarray(b2[:, :2]), jnp.ones(40, bool), jnp.asarray(R),
        RansacOptions(),
    )
    assert np.asarray(inl).all()


def test_integrate_gyro():
    # Constant angular velocity: R should equal exp(-w T) (JPL R_GtoI chaining).
    w = np.array([0.2, -0.1, 0.3])
    hz, T = 200.0, 0.5
    ts = np.arange(0, T + 1e-9, 1 / hz)
    ws = np.tile(w, (len(ts), 1))
    R = integrate_gyro(jnp.asarray(ts), jnp.asarray(ws), 0.0, T, jnp.zeros(3))
    R_true = np.asarray(exp_so3(jnp.asarray(-w * T)))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-9)
