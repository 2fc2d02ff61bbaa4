"""Direct unit test of the grouped out-of-state plane MSCKF update
(models/plane_msckf.py ≡ UpdaterMSCKF.cpp:197-649 plane half): a synthetic
plane scene must be recovered, consumed, chi2-accepted and must shrink the
covariance; a selection without plane ids must be a no-op."""

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


def _fixture(with_plane_ids=True, seed=0):
    rng = np.random.default_rng(seed)
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

    # Features on the plane z = 2 (CP = [0, 0, 2]).
    p_f = np.stack([rng.uniform(-0.4, 1.2, NF), rng.uniform(-0.5, 0.7, NF),
                    np.full(NF, 2.0)], axis=1)
    bank = FeatureBank.create(16, K)
    uv = np.zeros((16, K, 2))
    uvn = np.zeros((16, K, 2))
    mask = np.zeros((16, K), bool)
    for f in range(NF):
        for k in range(5):
            d = p_f[f] - clones_p[k]
            n = d[0:2] / d[2] + rng.normal(0, 0.3 / 300.0, 2)  # ~0.3 px noise
            uvn[f, k] = n
            uv[f, k] = n * ZETA[0:2] + ZETA[2:4]
            mask[f, k] = True
    bank = bank.replace(
        fid=bank.fid.at[:NF].set(jnp.arange(NF, dtype=jnp.int32)),
        uv=jnp.asarray(uv), uvn=jnp.asarray(uvn), mask=jnp.asarray(mask),
        planeid=bank.planeid.at[:NF].set(7 if with_plane_ids else -1),
    )
    sel_idx = jnp.arange(M, dtype=jnp.int32)
    sel_valid = jnp.asarray(np.arange(M) < NF)
    return state, bank, sel_idx, sel_valid


def test_grouped_plane_update_consumes_and_contracts():
    state, bank, sel_idx, sel_valid = _fixture(with_plane_ids=True)
    opts = PlaneMsckfOptions(base=PlaneInitOptions(max_msckf_plane=8),
                             plane_msckf_min_feat=5)
    new_state, consumed, n_up = msckf_plane_update(state, bank, opts, sel_idx, sel_valid)
    assert int(n_up) == 1
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
    new_state, consumed, n_up = msckf_plane_update(state, bank, opts, sel_idx, sel_valid)
    assert int(n_up) == 0
    assert not np.asarray(consumed).any()
    np.testing.assert_allclose(np.asarray(new_state.cov), np.asarray(state.cov))
