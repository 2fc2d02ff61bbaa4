"""Direct unit test of the grouped out-of-state plane MSCKF update
(models/plane_msckf.py ≡ UpdaterMSCKF.cpp:197-649 plane half): a synthetic
plane scene must be recovered, consumed, chi2-accepted and must shrink the
covariance; a selection without plane ids must be a no-op; multiple
qualifying planes must ALL update in one frame (the reference has no
plane-count cap), and cap overflow must be counted, not silent."""

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.plane_init import PlaneInitOptions
from ov_plane_tpu.models.plane_msckf import PlaneMsckfOptions, msckf_plane_update
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState

LAY = StateLayout(max_clones=6, max_slam=0, max_planes=2)
ZETA = np.array([300.0, 300.0, 320.0, 240.0, 0, 0, 0, 0])
NF, M = 8, 12  # plane features / selection size


def _base_state():
    state = VioState.create(LAY)
    K = LAY.max_clones
    # 5 clones translating along x and y (2D baseline; a pure x baseline
    # leaves the plane fit rank-deficient), identity orientation, camera = IMU
    # frame looking +z.
    cp_xy = np.array([[0.0, 0.0], [0.25, 0.05], [0.5, 0.2], [0.75, 0.05], [1.0, 0.3]])
    clones_p = np.zeros((K, 3))
    clones_p[:5, 0:2] = cp_xy
    clones_t = np.full(K, -np.inf)
    clones_t[:5] = np.arange(5.0)
    state = state.replace(
        clones_p=jnp.asarray(clones_p), clones_p_fej=jnp.asarray(clones_p),
        clones_t=jnp.asarray(clones_t), cam_zeta=jnp.asarray(ZETA),
        cov=jnp.asarray(np.eye(LAY.dim) * 1e-4), t=jnp.asarray(4.0),
    )
    return state, clones_p


def _observe(bank, uv, uvn, mask, row, p_f, clones_p, rng):
    for k in range(5):
        d = p_f - clones_p[k]
        n = d[0:2] / d[2] + rng.normal(0, 0.3 / 300.0, 2)  # ~0.3 px noise
        uvn[row, k] = n
        uv[row, k] = n * ZETA[0:2] + ZETA[2:4]
        mask[row, k] = True


def _fixture(with_plane_ids=True, seed=0):
    rng = np.random.default_rng(seed)
    state, clones_p = _base_state()
    K = LAY.max_clones

    # Features on the plane z = 2 (CP = [0, 0, 2]).
    p_f = np.stack([rng.uniform(-0.4, 1.2, NF), rng.uniform(-0.5, 0.7, NF),
                    np.full(NF, 2.0)], axis=1)
    bank = FeatureBank.create(16, K)
    uv = np.zeros((16, K, 2))
    uvn = np.zeros((16, K, 2))
    mask = np.zeros((16, K), bool)
    for f in range(NF):
        _observe(bank, uv, uvn, mask, f, p_f[f], clones_p, rng)
    bank = bank.replace(
        fid=bank.fid.at[:NF].set(jnp.arange(NF, dtype=jnp.int32)),
        uv=jnp.asarray(uv), uvn=jnp.asarray(uvn), mask=jnp.asarray(mask),
        planeid=bank.planeid.at[:NF].set(7 if with_plane_ids else -1),
    )
    sel_idx = jnp.arange(M, dtype=jnp.int32)
    sel_valid = jnp.asarray(np.arange(M) < NF)
    return state, bank, sel_idx, sel_valid


def _multi_plane_fixture(n_planes=3, feats_per_plane=5, seed=1):
    """n_planes distinct out-of-state planes, each with its own feature group."""
    rng = np.random.default_rng(seed)
    state, clones_p = _base_state()
    K = LAY.max_clones
    total = n_planes * feats_per_plane
    nslots = 32
    bank = FeatureBank.create(nslots, K)
    uv = np.zeros((nslots, K, 2))
    uvn = np.zeros((nslots, K, 2))
    mask = np.zeros((nslots, K), bool)
    pids = np.full(nslots, -1, np.int32)
    # Plane q: z = 1.5 + 0.7q, tilted slightly so normals differ.
    for q in range(n_planes):
        z0 = 1.5 + 0.7 * q
        tilt = 0.1 * q
        for j in range(feats_per_plane):
            row = q * feats_per_plane + j
            x, y = rng.uniform(-0.4, 1.2), rng.uniform(-0.5, 0.7)
            p_f = np.array([x, y, z0 + tilt * x])
            _observe(bank, uv, uvn, mask, row, p_f, clones_p, rng)
            pids[row] = 100 + q
    bank = bank.replace(
        fid=bank.fid.at[:total].set(jnp.arange(total, dtype=jnp.int32)),
        uv=jnp.asarray(uv), uvn=jnp.asarray(uvn), mask=jnp.asarray(mask),
        planeid=jnp.asarray(pids),
    )
    sel = max(total, 16)
    sel_idx = jnp.arange(sel, dtype=jnp.int32) % nslots
    sel_valid = jnp.asarray(np.arange(sel) < total)
    return state, bank, sel_idx, sel_valid, total


def test_grouped_plane_update_consumes_and_contracts():
    state, bank, sel_idx, sel_valid = _fixture(with_plane_ids=True)
    opts = PlaneMsckfOptions(base=PlaneInitOptions(max_msckf_plane=8),
                             plane_msckf_min_feat=5)
    new_state, consumed, n_up, n_drop = msckf_plane_update(state, bank, opts, sel_idx, sel_valid)
    assert int(n_up) == 1
    assert int(n_drop) == 0
    c = np.asarray(consumed)
    assert c[:NF].all() and not c[NF:].any()
    tr0 = float(jnp.trace(state.cov))
    tr1 = float(jnp.trace(new_state.cov))
    assert tr1 < tr0, (tr0, tr1)
    # Update correction is small and finite (observations are consistent).
    assert np.isfinite(np.asarray(new_state.imu)).all()
    assert float(jnp.linalg.norm(new_state.imu[4:7] - state.imu[4:7])) < 0.05


def test_no_plane_ids_is_noop():
    state, bank, sel_idx, sel_valid = _fixture(with_plane_ids=False)
    opts = PlaneMsckfOptions(base=PlaneInitOptions(max_msckf_plane=8),
                             plane_msckf_min_feat=5)
    new_state, consumed, n_up, n_drop = msckf_plane_update(state, bank, opts, sel_idx, sel_valid)
    assert int(n_up) == 0
    assert int(n_drop) == 0
    assert not np.asarray(consumed).any()
    np.testing.assert_allclose(np.asarray(new_state.cov), np.asarray(state.cov))


def test_three_planes_all_update_in_one_frame():
    """VERDICT r3 #3: ≥3 out-of-state planes must ALL update in one frame
    (UpdaterMSCKF.cpp:411-649 has no plane-count cap)."""
    state, bank, sel_idx, sel_valid, total = _multi_plane_fixture(n_planes=3)
    opts = PlaneMsckfOptions(base=PlaneInitOptions(max_msckf_plane=8),
                             plane_msckf_min_feat=5)  # default cap 8 > 3
    new_state, consumed, n_up, n_drop = msckf_plane_update(state, bank, opts, sel_idx, sel_valid)
    assert int(n_up) == 3, int(n_up)
    assert int(n_drop) == 0
    c = np.asarray(consumed)
    assert c[:total].all(), "every member of every plane group must be consumed"
    assert float(jnp.trace(new_state.cov)) < float(jnp.trace(state.cov))
    assert np.isfinite(np.asarray(new_state.imu)).all()


def test_cap_overflow_is_counted_not_silent():
    state, bank, sel_idx, sel_valid, _ = _multi_plane_fixture(n_planes=3)
    opts = PlaneMsckfOptions(base=PlaneInitOptions(max_msckf_plane=8),
                             plane_msckf_min_feat=5, max_planes_per_frame=1)
    _, _, n_up, n_drop = msckf_plane_update(state, bank, opts, sel_idx, sel_valid)
    assert int(n_up) == 1
    assert int(n_drop) == 2, "the two over-cap qualifying groups must be counted"
