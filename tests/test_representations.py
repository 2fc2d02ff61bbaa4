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

    # MSCKF features support every 3-dof representation (planes off).
    cfg = sim_config()
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.feat_rep_msckf = "ANCHORED_MSCKF_INVERSE_DEPTH"
    eng = VioEngine.from_config(cfg)
    assert eng.msckf_opts.jac.rep == reps.ANCHORED_MSCKF_INVERSE_DEPTH
    # ... but not with plane constraints on (reference invariant) ...
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    with pytest.raises(ValueError):
        VioEngine.from_config(cfg)
    # ... and the 1-dof single-depth rep does not fit the 3-column layout.
    cfg = sim_config()
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.feat_rep_msckf = "ANCHORED_INVERSE_DEPTH_SINGLE"
    with pytest.raises(NotImplementedError):
        VioEngine.from_config(cfg)


@pytest.mark.parametrize("rep_name", [
    "GLOBAL_FULL_INVERSE_DEPTH", "ANCHORED_3D",
    "ANCHORED_FULL_INVERSE_DEPTH", "ANCHORED_MSCKF_INVERSE_DEPTH",
])
def test_msckf_update_under_each_representation(rep_name):
    """The full MSCKF update under every 3-dof representation must accept the
    same consistent scene and produce (nearly) the GLOBAL_3D correction: the
    parameterizations linearize the same geometry, so on a well-conditioned
    scene the corrections differ only at linearization-error order
    (UpdaterHelper.cpp:35-193 routing, here via rep_jacobians chain rule)."""
    import jax.numpy as jnp

    from ov_plane_tpu.models.jacobians import JacobianOptions
    from ov_plane_tpu.models.msckf import MsckfOptions, msckf_update
    from ov_plane_tpu.state.layout import StateLayout
    from ov_plane_tpu.state.vio_state import VioState

    lay = StateLayout(max_clones=6, max_slam=0, max_planes=0)
    zeta = np.array([300.0, 300.0, 320.0, 240.0, 0, 0, 0, 0])
    rng = np.random.default_rng(3)
    K = lay.max_clones
    M, NF = 6, 4

    cp_xy = np.array([[0.0, 0.0], [0.25, 0.05], [0.5, 0.2], [0.75, 0.05], [1.0, 0.3]])
    clones_p = np.zeros((K, 3))
    clones_p[:5, 0:2] = cp_xy
    clones_t = np.full(K, -np.inf)
    clones_t[:5] = np.arange(5.0)
    state = VioState.create(lay).replace(
        clones_p=jnp.asarray(clones_p), clones_p_fej=jnp.asarray(clones_p),
        clones_t=jnp.asarray(clones_t), cam_zeta=jnp.asarray(zeta),
        cov=jnp.asarray(np.eye(lay.dim) * 1e-4), t=jnp.asarray(4.0),
    )
    p_f = np.stack([rng.uniform(-0.4, 1.2, NF), rng.uniform(-0.5, 0.7, NF),
                    rng.uniform(1.6, 2.6, NF)], axis=1)
    uv = np.zeros((M, K, 2))
    uvn = np.zeros((M, K, 2))
    mask = np.zeros((M, K), bool)
    for f in range(NF):
        for k in range(5):
            d = p_f[f] - clones_p[k]
            n = d[0:2] / d[2] + rng.normal(0, 0.3 / 300.0, 2)
            uvn[f, k] = n
            uv[f, k] = n * zeta[0:2] + zeta[2:4]
            mask[f, k] = True

    zeros3 = jnp.zeros((M, 3))
    args = (jnp.asarray(uv), jnp.asarray(uvn), jnp.asarray(mask), zeros3, zeros3,
            jnp.zeros(M, bool), jnp.zeros(M, bool), jnp.zeros(M, jnp.int32))

    def run(rep):
        opts = MsckfOptions(jac=JacobianOptions(rep=rep))
        new_state, used, _, tri_ok = msckf_update(state, opts, *args)
        return new_state, used, tri_ok

    base, used0, ok0 = run(reps.GLOBAL_3D)
    assert np.asarray(used0)[:NF].all()
    dx_base = np.asarray(base.imu[4:7] - state.imu[4:7])

    new_state, used, tri_ok = run(reps.from_name(rep_name))
    assert np.asarray(tri_ok)[:NF].all()
    assert np.asarray(used)[:NF].all(), rep_name
    assert np.isfinite(np.asarray(new_state.cov)).all()
    d = np.diag(np.asarray(new_state.cov))
    assert (d >= -1e-10).all()
    # Covariance contracts and the correction matches GLOBAL_3D closely.
    assert float(jnp.trace(new_state.cov)) < float(jnp.trace(state.cov))
    dx = np.asarray(new_state.imu[4:7] - state.imu[4:7])
    np.testing.assert_allclose(dx, dx_base, atol=2e-4)
