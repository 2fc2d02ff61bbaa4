"""Fail-safe robustness: randomized (valid-format but garbage-content) frame
streams must never produce NaN state or negative covariance diagonals — the
chi2 gates and masking are the TPU analogue of the reference's fail-fast
asserts (StateHelper.cpp:108-118) + soft rejection (SURVEY §5.3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import FrameData, VioEngine, init_state_with_gt, step
from ov_plane_tpu.utils.config import sim_config


def _engine(use_planes):
    cfg = sim_config()
    cfg.state.max_slam_features = 4
    cfg.state.use_plane_constraint = use_planes
    cfg.state.use_plane_slam_feats = use_planes
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.tpu.max_features = 48
    cfg.tpu.max_obs_per_frame = 32
    cfg.tpu.max_msckf_update = 12
    cfg.tpu.max_imu_per_frame = 24
    return cfg, VioEngine.from_config(cfg)


@pytest.mark.parametrize("use_planes", [False, True])
def test_random_streams_stay_finite(use_planes):
    cfg, eng = _engine(use_planes)
    rng = np.random.default_rng(11 + use_planes)
    state = init_state_with_gt(
        eng, cfg, t0=jnp.asarray(0.0), q0=jnp.asarray([0.0, 0, 0, 1.0]),
        p0=jnp.zeros(3), v0=jnp.zeros(3), bg0=jnp.zeros(3), ba0=jnp.zeros(3),
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    I, O = cfg.tpu.max_imu_per_frame, cfg.tpu.max_obs_per_frame
    w, h = cfg.cam_wh

    t = 0.0
    for k in range(40):
        dt = 0.1
        imu_t = t + np.linspace(0, dt, I)
        # Garbage-but-bounded IMU: strong rotations, non-gravity accels.
        imu_w = rng.normal(0, 1.0, (I, 3))
        imu_a = rng.normal(0, 3.0, (I, 3)) + [0, 0, 9.81]
        # Random observations: churning ids, some padding, uv across the
        # image (geometrically inconsistent on purpose), random plane ids.
        obs_id = rng.integers(0, 60, O).astype(np.int32)
        obs_id[rng.random(O) < 0.3] = -1
        obs_uv = np.stack([rng.uniform(0, w, O), rng.uniform(0, h, O)], axis=1)
        # Corrupt packets: a few NaN/Inf pixels must be dropped, not absorbed.
        obs_uv[rng.random(O) < 0.05] = np.nan
        obs_uv[rng.random(O) < 0.03] = np.inf
        obs_plane = np.where(rng.random(O) < 0.3,
                             rng.integers(0, 3, O), -1).astype(np.int32)
        frame = FrameData(
            imu_t=jnp.asarray(imu_t), imu_w=jnp.asarray(imu_w), imu_a=jnp.asarray(imu_a),
            t_new=jnp.asarray(t + dt), obs_id=jnp.asarray(obs_id),
            obs_uv=jnp.asarray(obs_uv), obs_plane=jnp.asarray(obs_plane),
        )
        state, bank, out = step(eng, state, bank, frame)
        t += dt

        assert np.isfinite(np.asarray(state.imu)).all(), k
        assert np.isfinite(np.asarray(out.p)).all(), k
        cov = np.asarray(state.cov)
        assert np.isfinite(cov).all(), k
        assert np.diag(cov).min() > -1e-9, (k, np.diag(cov).min())
