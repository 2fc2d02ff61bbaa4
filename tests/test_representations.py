"""Landmark representation parity (UpdaterHelper.cpp:35-193, Landmark.cpp).

Validates every representation's round-trip and its error-state Jacobians
against finite differences of the SAME perturbation conventions the filter
uses (JPL: R <- (I - skew(dth)) R)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.ops import representations as reps
from ov_plane_tpu.ops.quat import quat_2_rot

RNG = np.random.default_rng(11)

ALL_REPS = [
    reps.GLOBAL_3D,
    reps.GLOBAL_FULL_INVERSE_DEPTH,
    reps.ANCHORED_3D,
    reps.ANCHORED_FULL_INVERSE_DEPTH,
    reps.ANCHORED_MSCKF_INVERSE_DEPTH,
    reps.ANCHORED_INVERSE_DEPTH_SINGLE,
]


def random_anchor(rng):
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    qc = rng.normal(size=4)
    qc = qc / np.linalg.norm(qc)
    return reps.AnchorFrame(
        R_GtoI=quat_2_rot(jnp.asarray(q)),
        p_IinG=jnp.asarray(rng.normal(size=3)),
        R_ItoC=quat_2_rot(jnp.asarray(qc)),
        p_IinC=jnp.asarray(rng.normal(size=3) * 0.1),
    )


def sample_point(anchor):
    """A point safely in front of the anchor camera (z > 0 for inv-depth)."""
    p_FinA = jnp.asarray([0.4, -0.3, 2.5])
    return anchor.point_to_global(p_FinA)


@pytest.mark.parametrize("rep", ALL_REPS)
def test_roundtrip(rep):
    anchor = random_anchor(RNG)
    p_FinG = sample_point(anchor)
    params = reps.global_to_rep(rep, p_FinG, anchor)
    assert params.shape == (reps.dof(rep) if rep == reps.ANCHORED_INVERSE_DEPTH_SINGLE else 3,)
    bearing = None
    if rep == reps.ANCHORED_INVERSE_DEPTH_SINGLE:
        bearing = reps.single_depth_bearing(anchor.point_to_anchor(p_FinG))
    back = reps.rep_to_global(rep, params, anchor, bearing)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p_FinG), atol=1e-12)


@pytest.mark.parametrize("rep", ALL_REPS)
def test_jacobians_match_finite_differences(rep):
    anchor = random_anchor(RNG)
    p_FinG = sample_point(anchor)
    out = reps.rep_jacobians(rep, p_FinG, p_FinG, anchor, anchor, fej=False,
                             calib_extrinsic=True)
    np.testing.assert_allclose(np.asarray(out.p_FinG), np.asarray(p_FinG), atol=1e-10)

    eps = 1e-7
    d = reps.dof(rep)

    # H_f: perturb params.
    p_base = anchor.point_to_anchor(p_FinG) if reps.is_anchored(rep) else p_FinG
    params = reps.params_from_point(rep, p_base)
    bearing = reps.single_depth_bearing(p_base) if rep == reps.ANCHORED_INVERSE_DEPTH_SINGLE else None
    for j in range(d):
        dp = np.zeros(d)
        dp[j] = eps
        plus = reps.rep_to_global(rep, params + jnp.asarray(dp), anchor, bearing)
        minus = reps.rep_to_global(rep, params - jnp.asarray(dp), anchor, bearing)
        fd = (np.asarray(plus) - np.asarray(minus)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(out.H_f[:, j]), fd, atol=1e-5)

    if not reps.is_anchored(rep):
        assert not np.asarray(out.H_anchor).any()
        return

    # H_anchor / H_calib: perturb the frames with the JPL convention.
    I3 = np.eye(3)

    def recompose(dth_a, dp_a, dth_c, dp_c):
        anc = reps.AnchorFrame(
            R_GtoI=jnp.asarray((I3 - _skew(dth_a)) @ np.asarray(anchor.R_GtoI)),
            p_IinG=anchor.p_IinG + jnp.asarray(dp_a),
            R_ItoC=jnp.asarray((I3 - _skew(dth_c)) @ np.asarray(anchor.R_ItoC)),
            p_IinC=anchor.p_IinC + jnp.asarray(dp_c),
        )
        return np.asarray(reps.rep_to_global(rep, params, anc, bearing))

    for j in range(3):
        e = np.zeros(3)
        e[j] = eps
        fd = (recompose(e, 0 * e, 0 * e, 0 * e) - recompose(-e, 0 * e, 0 * e, 0 * e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(out.H_anchor[:, j]), fd, atol=1e-5)
        fd = (recompose(0 * e, e, 0 * e, 0 * e) - recompose(0 * e, -e, 0 * e, 0 * e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(out.H_anchor[:, 3 + j]), fd, atol=1e-5)
        fd = (recompose(0 * e, 0 * e, e, 0 * e) - recompose(0 * e, 0 * e, -e, 0 * e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(out.H_calib[:, j]), fd, atol=1e-5)
        fd = (recompose(0 * e, 0 * e, 0 * e, e) - recompose(0 * e, 0 * e, 0 * e, -e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(out.H_calib[:, 3 + j]), fd, atol=1e-5)


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


def test_closed_form_blocks():
    """Spot-check the two cases with trivially known closed forms:
    GLOBAL_3D -> H_f = I; ANCHORED_3D -> H_f = R_CtoG and
    H_anchor = [-R_GtoI^T skew(R_ItoC^T (p_FinA - p_IinC)) | I]
    (UpdaterHelper.cpp:39-43, 106-113, 124-127)."""
    anchor = random_anchor(RNG)
    p_FinG = sample_point(anchor)

    out = reps.rep_jacobians(reps.GLOBAL_3D, p_FinG, p_FinG, None, None, fej=False)
    np.testing.assert_allclose(np.asarray(out.H_f), np.eye(3), atol=1e-12)

    out = reps.rep_jacobians(reps.ANCHORED_3D, p_FinG, p_FinG, anchor, anchor, fej=False)
    R_CtoG = np.asarray(anchor.R_GtoI).T @ np.asarray(anchor.R_ItoC).T
    np.testing.assert_allclose(np.asarray(out.H_f), R_CtoG, atol=1e-10)
    p_FinA = np.asarray(anchor.point_to_anchor(p_FinG))
    expect_rot = -np.asarray(anchor.R_GtoI).T @ _skew(
        np.asarray(anchor.R_ItoC).T @ (p_FinA - np.asarray(anchor.p_IinC)))
    np.testing.assert_allclose(np.asarray(out.H_anchor[:, :3]), expect_rot, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.H_anchor[:, 3:]), np.eye(3), atol=1e-12)


def test_fej_uses_fej_anchor_frame():
    """With FEJ on, linearization re-expresses the best global point in the
    FEJ anchor frame (UpdaterHelper.cpp:92-105): the returned linearization
    point equals the true current p_FinG re-anchored through fej poses."""
    anchor = random_anchor(RNG)
    anchor_fej = reps.AnchorFrame(
        R_GtoI=anchor.R_GtoI, p_IinG=anchor.p_IinG + jnp.asarray([0.05, -0.02, 0.01]),
        R_ItoC=anchor.R_ItoC, p_IinC=anchor.p_IinC)
    p_FinG = sample_point(anchor)
    out = reps.rep_jacobians(reps.ANCHORED_3D, p_FinG, p_FinG, anchor, anchor_fej, fej=True)
    # Anchored round trip through the FEJ frame is the identity on p_FinG.
    np.testing.assert_allclose(np.asarray(out.p_FinG), np.asarray(p_FinG), atol=1e-12)
    # And the Jacobians use the FEJ frame's rotation.
    out_nofej = reps.rep_jacobians(reps.ANCHORED_3D, p_FinG, p_FinG, anchor, anchor, fej=False)
    np.testing.assert_allclose(np.asarray(out.H_f), np.asarray(out_nofej.H_f), atol=1e-12)


def test_engine_validates_feat_rep():
    """Engine config surface: unknown rep names rejected; the reference's
    planes->GLOBAL_3D invariant enforced (VioManager.cpp:823)."""
    from ov_plane_tpu.models.manager import VioEngine
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.state.feat_rep_slam = "NOT_A_REP"
    with pytest.raises(KeyError):
        VioEngine.from_config(cfg)

    cfg = sim_config()
    cfg.state.use_plane_constraint = True
    cfg.state.feat_rep_slam = "ANCHORED_3D"
    with pytest.raises(ValueError):
        VioEngine.from_config(cfg)

    cfg = sim_config()
    cfg.state.use_plane_constraint = False
    cfg.state.feat_rep_msckf = "ANCHORED_MSCKF_INVERSE_DEPTH"
    with pytest.raises(NotImplementedError):
        VioEngine.from_config(cfg)
