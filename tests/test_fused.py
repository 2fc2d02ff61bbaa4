"""Fused one-dispatch vision step (frontend/fused.py): the whole frontend +
filter frame as a single jitted program, driven single-stream and vmapped
over a stream batch."""

import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.frontend.fused import FusedVisionDriver
from ov_plane_tpu.frontend.synthetic import render_frame
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def _setup():
    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.cam_wh = [320, 240]
    cfg.cam_intrinsics = [200.0, 200.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    sim = build_sim(cfg, max_obs=64)
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    n = min(22, sim.cam_t_imu.shape[0] - 1)
    frames = [
        render_frame(feat_p, np.asarray(quat_2_rot(sim.gt_q[i])), np.asarray(sim.gt_p[i]),
                     R_ItoC, p_IinC, zeta, cfg.cam_wh)
        for i in range(1, n + 1)
    ]
    return cfg, eng, state, bank, sim, frames, n


def _imu_window(cfg, sim, i):
    W = cfg.tpu.max_imu_per_frame
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    s0 = int(sim.imu_window_start[i])
    it = np.full(W, np.inf)
    iw = np.zeros((W, 3))
    ia = np.zeros((W, 3))
    m = len(imu_t[s0:s0 + W])
    it[:m] = imu_t[s0:s0 + W]
    iw[:m] = imu_w[s0:s0 + W]
    ia[:m] = imu_a[s0:s0 + W]
    return it, iw, ia


def test_pack_inputs_wire_dtypes():
    """The split upload (image wire + f32 payload) round-trips exactly: u8 is
    bit-lossless for 8-bit-derived sources, f16/f32 within dtype eps, and the
    payload (IMU windows incl inf padding, labels, merges, t_new) is exact."""
    from ov_plane_tpu.frontend import fast as ffast
    from ov_plane_tpu.frontend import klt as fklt
    from ov_plane_tpu.frontend.fused import (FusedVisionOptions, _pack_inputs,
                                             _unpack_inputs)
    from ov_plane_tpu.frontend.ransac import RansacOptions

    rng = np.random.default_rng(0)
    W = 5
    base = FusedVisionOptions(
        cam_model=0, h=24, w=32, cap=8, num_target=6,
        klt=fklt.KltOptions(), fast=ffast.FastOptions(),
        ransac=RansacOptions(), histogram_method=0)
    # u8-derived float source (what the EuRoC/bag readers produce).
    img = rng.integers(0, 256, (24, 32)).astype(np.float32) / 255.0
    imu_t = np.array([1.0, 2.0, 3.0, np.inf, np.inf])
    imu_w = rng.normal(0, 1, (W, 3))
    imu_a = rng.normal(0, 1, (W, 3))
    li = np.arange(8, dtype=np.int32)
    lp = np.full(8, 3, np.int32)
    mf = np.full(8, -1, np.int32)
    mi = np.full(8, 2, np.int32)
    for wire_name, atol in [("u8", 0.0), ("f16", 3e-4), ("f32", 0.0)]:
        vo = base._replace(img_wire=wire_name)
        wire, pay = _pack_inputs(vo, W, img, imu_t, imu_w, imu_a, 7.25,
                                 li, lp, mf, mi)
        img2, it2, iw2, ia2, tn2, li2, lp2, mf2, mi2 = _unpack_inputs(
            vo, W, jnp.asarray(wire), jnp.asarray(pay))
        np.testing.assert_allclose(np.asarray(img2), img, atol=atol)
        np.testing.assert_array_equal(np.asarray(it2), imu_t.astype(np.float32))
        np.testing.assert_allclose(np.asarray(iw2), imu_w, atol=1e-6)
        assert float(tn2) == 7.25
        np.testing.assert_array_equal(np.asarray(li2), li)
        np.testing.assert_array_equal(np.asarray(lp2), lp)
        np.testing.assert_array_equal(np.asarray(mf2), mf)
        np.testing.assert_array_equal(np.asarray(mi2), mi)
    # Batched form carries the leading stream axis through both arrays.
    vo = base._replace(img_wire="u8")
    wireb, payb = _pack_inputs(vo, W, np.stack([img, img]),
                               np.stack([imu_t] * 2), np.stack([imu_w] * 2),
                               np.stack([imu_a] * 2), np.array([7.25, 7.25]),
                               np.stack([li] * 2), np.stack([lp] * 2),
                               np.stack([mf] * 2), np.stack([mi] * 2))
    assert wireb.shape == (2, 24, 32) and wireb.dtype == np.uint8
    assert payb.shape[0] == 2 and payb.dtype == np.float32


@pytest.mark.slow
def test_fused_vision_tracks_and_filters():
    cfg, eng, state, bank, sim, frames, n = _setup()
    drv = FusedVisionDriver(cfg, eng)
    fev = drv.init_frontend()
    errs, tracked = [], []
    for i in range(1, n + 1):
        it, iw, ia = _imu_window(cfg, sim, i)
        state, bank, fev, out = drv.step_stream(
            state, bank, fev, frames[i - 1], it, iw, ia, float(sim.cam_t_imu[i]))
        errs.append(float(jnp.linalg.norm(out.p - sim.gt_p[i])))
        tracked.append(int(np.sum(np.asarray(fev.valid))))
    assert np.mean(tracked[2:]) > 15, tracked
    assert errs[-1] < 0.5, errs[-5:]
    assert np.max(errs) < 1.0, np.max(errs)


@pytest.mark.slow
def test_fused_batch_sharded_matches_unsharded():
    """The fused vision step sharded over a dp mesh (streams -> devices,
    multi-chip vision serving) produces the same filter trajectories as the
    single-device vmapped batch — the vision-path analog of the sim path's
    sharded-replay equivalence (tests/test_parallel.py)."""
    import jax
    from jax.sharding import Mesh

    cfg, eng, state, bank, sim, frames, n = _setup()
    n = min(n, 6)
    B = 4
    rng = np.random.default_rng(3)
    noise = rng.normal(0.0, 0.01, (B, *frames[0].shape)).astype(np.float32)

    def run(drv):
        fev = drv.init_frontend()
        states = jax.tree.map(lambda x: jnp.stack([x] * B), state)
        banks = jax.tree.map(lambda x: jnp.stack([x] * B), bank)
        fevs = jax.tree.map(lambda x: jnp.stack([x] * B), fev)
        for i in range(1, n + 1):
            it, iw, ia = _imu_window(cfg, sim, i)
            imgs = np.clip(frames[i - 1][None] + noise, 0.0, 1.0)
            states, banks, fevs, out = drv.step_batch(
                states, banks, fevs, imgs,
                np.tile(it, (B, 1)), np.tile(iw, (B, 1, 1)), np.tile(ia, (B, 1, 1)),
                np.full(B, float(sim.cam_t_imu[i])))
        return np.asarray(out.p), np.asarray(out.q)

    p_ref, q_ref = run(FusedVisionDriver(cfg, eng, batch=B))
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("dp",))
    p_sh, q_sh = run(FusedVisionDriver(cfg, eng, batch=B, mesh=mesh))
    # Per-shard compilation reassociates f32 reductions; equivalence is to
    # rounding (measured 3e-8), not bitwise.
    np.testing.assert_allclose(p_sh, p_ref, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(q_sh, q_ref, atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_fused_batch_matches_itself_and_stays_bounded():
    """vmapped stream batch: identical streams stay identical members, and
    the batched driver's filters stay bounded (the batched vision replay —
    VERDICT round-2 item 3)."""
    import jax

    cfg, eng, state, bank, sim, frames, n = _setup()
    B = 2
    drv = FusedVisionDriver(cfg, eng, batch=B)
    fev = drv.init_frontend()
    states = jax.tree.map(lambda x: jnp.stack([x] * B), state)
    banks = jax.tree.map(lambda x: jnp.stack([x] * B), bank)
    fevs = jax.tree.map(lambda x: jnp.stack([x] * B), fev)
    for i in range(1, n + 1):
        it, iw, ia = _imu_window(cfg, sim, i)
        states, banks, fevs, out = drv.step_batch(
            states, banks, fevs, np.stack([frames[i - 1]] * B),
            np.tile(it, (B, 1)), np.tile(iw, (B, 1, 1)), np.tile(ia, (B, 1, 1)),
            np.full(B, float(sim.cam_t_imu[i])))
    p = np.asarray(out.p)
    np.testing.assert_allclose(p[0], p[1], atol=1e-12)
    err = np.linalg.norm(p[0] - np.asarray(sim.gt_p[n]))
    assert err < 0.5, err
    assert np.mean([int(v) for v in np.sum(np.asarray(fevs.valid), axis=1)]) > 15


@pytest.mark.slow
def test_fused_staged_image_matches_raw():
    """drv.stage_image (async pack+upload, the prefetch ingest path) feeds
    step_batch/step_stream bit-identically to passing the raw float image."""
    import jax

    cfg, eng, state, bank, sim, frames, n = _setup()
    n = min(n, 5)
    B = 2

    def run(staged):
        drv = FusedVisionDriver(cfg, eng, batch=B)
        fev = drv.init_frontend()
        states = jax.tree.map(lambda x: jnp.stack([x] * B), state)
        banks = jax.tree.map(lambda x: jnp.stack([x] * B), bank)
        fevs = jax.tree.map(lambda x: jnp.stack([x] * B), fev)
        for i in range(1, n + 1):
            it, iw, ia = _imu_window(cfg, sim, i)
            imgs = np.stack([frames[i - 1]] * B)
            img_in = drv.stage_image(imgs) if staged else imgs
            states, banks, fevs, out = drv.step_batch(
                states, banks, fevs, img_in,
                np.tile(it, (B, 1)), np.tile(iw, (B, 1, 1)), np.tile(ia, (B, 1, 1)),
                np.full(B, float(sim.cam_t_imu[i])))
        return np.asarray(out.p), np.asarray(out.q)

    p_raw, q_raw = run(staged=False)
    p_st, q_st = run(staged=True)
    np.testing.assert_array_equal(p_st, p_raw)
    np.testing.assert_array_equal(q_st, q_raw)
