"""Vectorized visual-inertial simulator.

Re-design of the reference ``Simulator`` (sim/Simulator.cpp) for batch
execution: instead of a stateful object producing one measurement per call
(get_next_imu :321, get_next_cam :388), we precompute the *entire* measurement
timeline as fixed-shape device arrays once, and the estimator replays them
under ``lax.scan``. Deterministic by construction:

* environment/map generation (planes + feature map) runs once on the host in
  NumPy with a seeded generator, mirroring the reference's mask-based
  rejection sampling (generate_points :509, generate_planes :645,
  project_pointcloud :450);
* measurement noise + bias random walks are JAX ``jax.random`` streams keyed
  by role, matching the reference's role-separated mt19937 seeds
  (Simulator.cpp:144-155); the bias walk's sequential accumulation is a
  cumulative sum (bit-for-bit the same recursion, evaluated in parallel);
* per-frame feature visibility (projection, 10 px occupancy dedup keeping
  lowest feature index, first-K selection in map order) reproduces the
  reference's sequential loops as sort/scan-free vectorized ops.

All downstream consumers see: IMU stream [Ti], camera stream [Tc, O] with
(id, uv, plane_id) triples — the exact information TrackSIM hands the
reference estimator (VioManager.cpp:211-230).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.ops import cams, spline as sp
from ov_plane_tpu.ops.quat import quat_2_rot, rot_2_quat
from ov_plane_tpu.sim.trajectory import get_trajectory
from ov_plane_tpu.utils.config import VioConfig


class SimPlanes(NamedTuple):
    corners: np.ndarray  # [P, 4, 3]: top_left, top_right, bottom_left, bottom_right
    normal: np.ndarray   # [P, 3] unit
    d: np.ndarray        # [P] plane offset: n·x = d
    cp: np.ndarray       # [P, 3] closest point


class SimData(NamedTuple):
    """Precomputed measurement streams + ground truth (device arrays)."""

    # IMU stream (noisy) and truth.
    imu_t: jnp.ndarray       # [Ti]
    imu_w: jnp.ndarray       # [Ti, 3] noisy measurements
    imu_a: jnp.ndarray       # [Ti, 3]
    imu_w_true: jnp.ndarray  # [Ti, 3] noiseless (for Monte-Carlo re-noising)
    imu_a_true: jnp.ndarray  # [Ti, 3]
    gt_bg: jnp.ndarray       # [Ti, 3] true gyro bias at imu_t
    gt_ba: jnp.ndarray       # [Ti, 3]
    # Camera stream.
    cam_t: jnp.ndarray       # [Tc] measurement clock (imu time - calib_camimu_dt)
    cam_t_imu: jnp.ndarray   # [Tc] imu-clock time of exposure
    obs_id: jnp.ndarray      # [Tc, O] int32, -1 = pad
    obs_uv: jnp.ndarray      # [Tc, O, 2] distorted pixels (noisy)
    obs_uv_true: jnp.ndarray # [Tc, O, 2] noiseless pixels
    obs_plane: jnp.ndarray   # [Tc, O] int32, -1 = free point
    obs_gt_p: jnp.ndarray    # [Tc, O, 3] true feature positions (gt injection)
    obs_gt_cp: jnp.ndarray   # [Tc, O, 3] true plane CPs (zeros for free points)
    imu_window_start: jnp.ndarray  # [Tc] int32: first imu index ≥ previous frame
    # Ground truth at camera times.
    gt_q: jnp.ndarray        # [Tc, 4] JPL q_GtoI
    gt_p: jnp.ndarray        # [Tc, 3]
    gt_v: jnp.ndarray        # [Tc, 3]
    gt_bg_cam: jnp.ndarray   # [Tc, 3]
    gt_ba_cam: jnp.ndarray   # [Tc, 3]
    # Ground-truth map.
    feat_p: jnp.ndarray      # [N, 3]
    feat_plane: jnp.ndarray  # [N] int32 (-1 free)
    plane_cp: jnp.ndarray    # [P, 3]


def perturb_calibration(cfg: VioConfig, seed: int):
    """Perturb the calibration the ESTIMATOR starts from (the simulator keeps
    truth) — Simulator::perturb_parameters (Simulator.cpp:243-275).

    Returns (calib_dt, cam_intrinsics[8], cam_extrinsics[7]) perturbed copies.
    """
    rng = np.random.default_rng(seed)
    dt = cfg.calib_camimu_dt + 0.01 * rng.standard_normal()
    zeta = np.asarray(cfg.cam_intrinsics, float).copy()
    zeta[0:4] += 1.0 * rng.standard_normal(4)
    zeta[4:8] += 0.005 * rng.standard_normal(4)
    ext = np.asarray(cfg.cam_extrinsics, float).copy()
    w = 0.001 * rng.standard_normal(3)
    from ov_plane_tpu.ops.quat import exp_so3, rot_2_quat

    R_new = np.asarray(exp_so3(jnp.asarray(w))) @ np.asarray(quat_2_rot(jnp.asarray(ext[0:4])))
    ext[0:4] = np.asarray(rot_2_quat(jnp.asarray(R_new)))
    ext[4:7] += 0.01 * rng.standard_normal(3)
    return dt, zeta, ext


def generate_planes(traj_pos: np.ndarray, min_gen_dist: float) -> SimPlanes:
    """Cuboid room around the trajectory (Simulator::generate_planes :645-707)."""
    mn = traj_pos.min(axis=0)
    mx = traj_pos.max(axis=0)
    multi_xy, multi_z = 0.7, 0.24
    mn[:2] -= multi_xy * min_gen_dist
    mn[2] -= multi_z * min_gen_dist
    mx[:2] += multi_xy * min_gen_dist
    mx[2] += multi_z * min_gen_dist
    d = mx - mn
    b1 = np.array([mn[0], mn[1], mn[2]])
    b2 = b1 + [d[0], 0, 0]
    b3 = b1 + [0, d[1], 0]
    b4 = b1 + [d[0], d[1], 0]
    t1, t2, t3, t4 = (b + [0, 0, d[2]] for b in (b1, b2, b3, b4))
    # (top_left, top_right, bottom_left, bottom_right) per face, reference order.
    faces = [
        (b1, b2, b3, b4),  # floor
        (t3, t4, t2, t1),  # ceiling
        (t3, t1, b3, b1),
        (t1, t2, b1, b2),
        (t2, t4, b2, b4),
        (t4, t3, b4, b3),
    ]
    corners = np.stack([np.stack(f) for f in faces])  # [6, 4, 3]
    v1 = corners[:, 1] - corners[:, 0]
    v2 = corners[:, 2] - corners[:, 0]
    n_raw = np.cross(v1, v2)
    n_norm = np.linalg.norm(n_raw, axis=1, keepdims=True)
    normal = n_raw / n_norm
    d_off = np.einsum("pi,pi->p", normal, corners[:, 0])  # n·x = d
    cp = normal * d_off[:, None]
    return SimPlanes(corners=corners, normal=normal, d=d_off, cp=cp)


def _ray_plane_hits(planes: SimPlanes, origin: np.ndarray, bearing: np.ndarray):
    """First bounded-plane hit along a ray (SimPlane::calculate_intersection :79-102).

    Returns (depth, plane_index) with depth = inf if no hit.
    """
    denom = planes.normal @ bearing
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    t = (planes.d - planes.normal @ origin) / denom
    pt = origin[None, :] + t[:, None] * bearing[None, :]

    def unit(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    tl, tr, bl, br = (planes.corners[:, i] for i in range(4))
    V1, V2 = unit(tr - tl), unit(bl - tl)
    V3, V4 = unit(tr - br), unit(bl - br)
    U1, U2 = unit(pt - tl), unit(pt - br)
    ok = (
        (t > 0)
        & (np.einsum("pi,pi->p", U1, V1) > 0)
        & (np.einsum("pi,pi->p", U1, V2) > 0)
        & (np.einsum("pi,pi->p", U2, V3) > 0)
        & (np.einsum("pi,pi->p", U2, V4) > 0)
    )
    t = np.where(ok, t, np.inf)
    idx = int(np.argmin(t))
    return float(t[idx]), (idx if np.isfinite(t[idx]) else -1)


def _np_distort(uvn: np.ndarray, zeta: np.ndarray, model: int) -> np.ndarray:
    """NumPy twin of cams.distort_norm for the host-side map builder
    (avoids per-shape XLA recompiles in the rejection-sampling loop)."""
    x, y = uvn[..., 0], uvn[..., 1]
    fx, fy, cx, cy = zeta[0], zeta[1], zeta[2], zeta[3]
    if model == cams.RADTAN:
        k1, k2, p1, p2 = zeta[4], zeta[5], zeta[6], zeta[7]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    else:
        k1, k2, k3, k4 = zeta[4], zeta[5], zeta[6], zeta[7]
        r = np.sqrt(np.maximum(x * x + y * y, 1e-16))
        theta = np.arctan(r)
        theta_d = theta * (1 + k1 * theta**2 + k2 * theta**4 + k3 * theta**6 + k4 * theta**8)
        scale = theta_d / r
        xd, yd = x * scale, y * scale
    return np.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def _np_undistort(uv: np.ndarray, zeta: np.ndarray, model: int, iters: int = 25) -> np.ndarray:
    """Fixed-point undistortion (NumPy, vectorized)."""
    fx, fy, cx, cy = zeta[0], zeta[1], zeta[2], zeta[3]
    target = np.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    x = target.copy()
    for _ in range(iters):
        d = _np_distort(x, zeta, model)
        dn = np.stack([(d[..., 0] - cx) / fx, (d[..., 1] - cy) / fy], axis=-1)
        x = x + (target - dn)
    return x


def build_feature_map(cfg: VioConfig, spl, planes: SimPlanes, t_start: float, t_end: float, seed: int):
    """Host-side map construction (Simulator ctor loop :180-237 + generate_points).

    Walks frames at 4 Hz; tops up free-space and on-plane features whenever a
    frame sees too few, using occupancy-mask rejection sampling. Pure NumPy
    (one-time setup work; the measurement streams stay in JAX). Returns
    (feat_p [N,3], feat_plane [N]).
    """
    rng = np.random.default_rng(seed)
    zeta = np.asarray(cfg.cam_intrinsics)
    w_img, h_img = cfg.cam_wh
    model = cams.RADTAN if cfg.cam_model == "radtan" else cams.EQUI
    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    sub = 10.0
    gw, gh = int(w_img // sub) + 1, int(h_img // sub) + 1
    max_gen, min_gen = cfg.sim.max_feature_gen_distance, cfg.sim.min_feature_gen_distance

    # Sample all poses once (batched).
    dt = 0.25
    times = np.arange(t_start, t_end, dt)
    pose_f = jax.jit(jax.vmap(lambda t: sp.pose(spl, t)))
    R_all, p_all = pose_f(jnp.asarray(times))
    R_all, p_all = np.asarray(R_all), np.asarray(p_all)

    feat_p: list[np.ndarray] = []
    feat_plane: list[int] = []

    def project_all(R_GtoI, p_IinG):
        """Project current map; returns (u, v, valid) arrays."""
        if not feat_p:
            return np.zeros((0,)), np.zeros((0,)), np.zeros((0,), bool)
        P = np.stack(feat_p)
        p_FinC = (R_ItoC @ (R_GtoI @ (P - p_IinG).T)).T + p_IinC
        z = p_FinC[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            uvn = p_FinC[:, :2] / z[:, None]
        uv = _np_distort(np.nan_to_num(uvn), zeta, model)
        valid = (z > 0.1) & (z <= max_gen) & (uv[:, 0] >= 0) & (uv[:, 0] <= w_img) & (uv[:, 1] >= 0) & (uv[:, 1] <= h_img)
        return uv[:, 0], uv[:, 1], valid

    for R_GtoI, p_IinG in zip(R_all, p_all):
        u, v, valid = project_all(R_GtoI, p_IinG)
        pl = np.asarray(feat_plane)
        n_free = int(np.sum(valid & (pl == -1))) if len(pl) else 0
        n_plane = int(np.sum(valid & (pl >= 0))) if len(pl) else 0

        mask = np.zeros((gw, gh), bool)
        if len(pl):
            iu = np.clip((u[valid] // sub).astype(int), 0, gw - 1)
            iv = np.clip((v[valid] // sub).astype(int), 0, gh - 1)
            mask[iu, iv] = True

        cam_origin = p_IinG - R_GtoI.T @ R_ItoC.T @ p_IinC
        existing = np.stack(feat_p) if feat_p else np.zeros((0, 3))

        for want, on_plane in ((cfg.num_pts - n_free, False), (cfg.num_pts_plane - n_plane, True)):
            added = 0
            attempts = 0
            while added < want and attempts < 5000:
                attempts += 1
                ud = rng.uniform(0, w_img)
                vd = rng.uniform(0, h_img)
                cu, cv = int(ud // sub), int(vd // sub)
                if mask[cu, cv]:
                    continue
                uvn = _np_undistort(np.array([ud, vd]), zeta, model)
                bearing_G = R_GtoI.T @ R_ItoC.T @ np.array([uvn[0], uvn[1], 1.0])
                if on_plane:
                    depth, pid = _ray_plane_hits(planes, cam_origin, bearing_G)
                    if pid < 0:
                        continue
                    plane_id = pid
                else:
                    depth = rng.uniform(min_gen, max_gen)
                    plane_id = -1
                p_FinG = cam_origin + depth * bearing_G
                p_FinC = R_ItoC @ (R_GtoI @ (p_FinG - p_IinG)) + p_IinC
                if p_FinC[2] < 0.1 or p_FinC[2] > max_gen:
                    continue
                if len(existing) and np.min(np.linalg.norm(existing - p_FinG, axis=1)) < 0.10:
                    continue
                mask[cu, cv] = True
                feat_p.append(p_FinG)
                feat_plane.append(plane_id)
                existing = np.vstack([existing, p_FinG[None]])
                added += 1

    return np.stack(feat_p), np.asarray(feat_plane, np.int32)


def _find_start_time(spl, freq_cam: float, threshold: float) -> float:
    """Skip the stationary head of the trajectory (Simulator.cpp:95-124)."""
    t = float(spl.start_time)
    t_end = float(spl.end_time)
    ts = np.arange(t, t_end, 1.0 / freq_cam)
    pos = np.asarray(jax.jit(jax.vmap(lambda tt: sp.pose(spl, tt)[1]))(jnp.asarray(ts)))
    dist = np.concatenate([[0.0], np.cumsum(np.linalg.norm(np.diff(pos, axis=0), axis=1))])
    idx = int(np.searchsorted(dist, threshold))
    return float(ts[min(idx, len(ts) - 1)])


def build_sim(cfg: VioConfig, max_obs: int | None = None, dtype=jnp.float64) -> SimData:
    """Construct the full simulation: map + measurement streams."""
    max_obs = max_obs or cfg.tpu.max_obs_per_frame
    times, pos, quat = get_trajectory(cfg.sim)
    from ov_plane_tpu.ops.quat import quat_2_rot

    spl = sp.fit_spline(jnp.asarray(times), jnp.asarray(quat), jnp.asarray(pos))
    t_start = _find_start_time(spl, cfg.sim.freq_cam, cfg.sim.distance_threshold)
    # Leave one control interval of margin at the end for acceleration queries.
    t_end = float(spl.end_time) - 2.0 * float(spl.dt)

    planes = generate_planes(pos, cfg.sim.min_feature_gen_distance)
    feat_p, feat_plane = build_feature_map(cfg, spl, planes, t_start, t_end, cfg.sim.seed_state_init)

    # ---------------- IMU stream ----------------
    dt_imu = 1.0 / cfg.sim.freq_imu
    imu_t = np.arange(t_start + dt_imu, t_end, dt_imu)
    ti = jnp.asarray(imu_t)
    accel_f = jax.jit(jax.vmap(lambda t: sp.acceleration(spl, t)))
    R_GtoI_i, _, w_IinI, _, _, a_IinG = accel_f(ti)
    gravity = jnp.asarray([0.0, 0.0, cfg.gravity_mag], dtype)
    a_body = jnp.einsum("nij,nj->ni", R_GtoI_i, a_IinG + gravity)

    key = jax.random.PRNGKey(cfg.sim.seed_measurements)
    k_cam = jax.random.split(key, 5)[4]

    # ---------------- camera stream ----------------
    dt_cam = 1.0 / cfg.sim.freq_cam
    cam_t_imu = np.arange(t_start + dt_cam, t_end - dt_imu, dt_cam)
    tc = jnp.asarray(cam_t_imu)
    n_c = len(cam_t_imu)
    pose_f = jax.jit(jax.vmap(lambda t: sp.velocity(spl, t)))
    R_GtoI_c, p_c, _, v_c = pose_f(tc)
    gt_q = jax.vmap(rot_2_quat)(R_GtoI_c)

    zeta = jnp.asarray(cfg.cam_intrinsics, dtype)
    model = cams.RADTAN if cfg.cam_model == "radtan" else cams.EQUI
    R_ItoC = quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4], dtype))
    p_IinC = jnp.asarray(cfg.cam_extrinsics[4:7], dtype)
    fp = jnp.asarray(feat_p, dtype)
    fplane = jnp.asarray(feat_plane)
    w_img, h_img = cfg.cam_wh
    n_select = cfg.num_pts + cfg.num_pts_plane

    def frame_obs(R_GtoI, p_IinG, _k):
        """Project the whole map; occupancy-dedup; first-n_select in map order;
        add pixel noise (project_pointcloud :450-507 + get_next_cam :411-444)."""
        p_FinC = (R_ItoC @ (R_GtoI @ (fp - p_IinG).T)).T + p_IinC
        z = p_FinC[:, 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        uvn = p_FinC[:, :2] / z_safe[:, None]
        uv = jax.vmap(lambda q_: cams.distort_norm(q_, zeta, model))(uvn)
        valid = (
            (z > 0.1) & (z <= cfg.sim.max_feature_gen_distance)
            & (uv[:, 0] >= 0) & (uv[:, 0] <= w_img) & (uv[:, 1] >= 0) & (uv[:, 1] <= h_img)
        )
        # Occupancy dedup at 10 px: keep lowest feature index per cell.
        cell = (jnp.floor(uv[:, 0] / 10.0) * (h_img // 10 + 2) + jnp.floor(uv[:, 1] / 10.0)).astype(jnp.int32)
        cell = jnp.where(valid, cell, -1 - jnp.arange(fp.shape[0]))  # invalid → unique cells
        order = jnp.arange(fp.shape[0])
        # first-occurrence: sort by (cell, idx); mark rows whose cell equals prev.
        perm = jnp.lexsort((order, cell))
        cell_sorted = cell[perm]
        dup_sorted = jnp.concatenate([jnp.asarray([False]), cell_sorted[1:] == cell_sorted[:-1]])
        dup = jnp.zeros_like(dup_sorted).at[perm].set(dup_sorted)
        valid = valid & ~dup
        # Select first n_select valid features in map order.
        rank = jnp.cumsum(valid) - 1
        take = valid & (rank < n_select)
        slot = jnp.where(take, rank, max_obs)  # overflow bucket
        ids = jnp.full((max_obs + 1,), -1, jnp.int32).at[slot].set(jnp.where(take, order, -1).astype(jnp.int32))[:max_obs]
        uvs_true = jnp.zeros((max_obs + 1, 2), dtype).at[slot].set(jnp.where(take[:, None], uv, 0.0))[:max_obs]
        pls = jnp.full((max_obs + 1,), -1, jnp.int32).at[slot].set(jnp.where(take, fplane, -1))[:max_obs]
        return ids, uvs_true, pls

    cam_keys = jax.random.split(k_cam, n_c)
    obs_id, obs_uv_true, obs_plane = jax.jit(jax.vmap(frame_obs))(R_GtoI_c, p_c, cam_keys)

    # IMU window bookkeeping: first IMU index at-or-after each previous frame
    # time, minus margin so time-offset calibration (up to ±8 samples ≈ 20 ms
    # of dt estimate) keeps the propagation interval covered.
    prev_t = np.concatenate([[t_start], cam_t_imu[:-1]])
    win_start = np.searchsorted(imu_t, prev_t - 1e-9) - 9
    win_start = np.clip(win_start, 0, None).astype(np.int32)

    # Per-observation ground truth for use_groundtruths injection.
    fp_pad = jnp.concatenate([fp, jnp.zeros((1, 3), dtype)])
    obs_idx = jnp.where(obs_id >= 0, obs_id, fp.shape[0])
    obs_gt_p = fp_pad[obs_idx]
    cp_pad = jnp.concatenate([jnp.asarray(planes.cp, dtype), jnp.zeros((1, 3), dtype)])
    obs_cp_idx = jnp.where(obs_plane >= 0, obs_plane, planes.cp.shape[0])
    obs_gt_cp = cp_pad[obs_cp_idx]

    zeros_i = jnp.zeros((len(imu_t), 3), dtype)
    zeros_c = jnp.zeros((n_c, 3), dtype)
    truth = SimData(
        imu_t=ti, imu_w=w_IinI, imu_a=a_body, imu_w_true=w_IinI, imu_a_true=a_body,
        gt_bg=zeros_i, gt_ba=zeros_i,
        cam_t=tc - cfg.calib_camimu_dt, cam_t_imu=tc,
        obs_id=obs_id, obs_uv=obs_uv_true, obs_uv_true=obs_uv_true, obs_plane=obs_plane,
        obs_gt_p=obs_gt_p, obs_gt_cp=obs_gt_cp,
        imu_window_start=jnp.asarray(win_start),
        gt_q=gt_q, gt_p=p_c, gt_v=v_c, gt_bg_cam=zeros_c, gt_ba_cam=zeros_c,
        feat_p=fp, feat_plane=fplane, plane_cp=jnp.asarray(planes.cp, dtype),
    )
    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=dt_imu,
    )
    return apply_noise(truth, jax.random.PRNGKey(cfg.sim.seed_measurements), noise)


def _interp(ts, vals, t):
    i = jnp.clip(jnp.searchsorted(ts, t) - 1, 0, ts.shape[0] - 2)
    lam = jnp.clip((t - ts[i]) / (ts[i + 1] - ts[i]), 0.0, 1.0)
    return (1 - lam) * vals[i] + lam * vals[i + 1]


class NoiseParams(NamedTuple):
    """Static noise magnitudes for Monte-Carlo re-noising."""

    sigma_w: float
    sigma_a: float
    sigma_wb: float
    sigma_ab: float
    sigma_pix: float
    dt_imu: float


@functools.partial(jax.jit, static_argnames=("noise",))
def apply_noise(truth: SimData, key, noise: "NoiseParams") -> SimData:
    """Draw one Monte-Carlo instance: bias random walks + white IMU noise +
    pixel noise on top of the noiseless streams (Simulator.cpp:355-382,
    get_next_cam :434-439). vmap over keys for a whole MC sweep in one batch.
    """
    dtype = truth.imu_w_true.dtype
    k_bw, k_ba, k_w, k_a, k_px = jax.random.split(key, 5)
    n_i = truth.imu_t.shape[0]
    sqdt = jnp.sqrt(jnp.asarray(noise.dt_imu, dtype))
    steps_g = noise.sigma_wb * sqdt * jax.random.normal(k_bw, (n_i, 3), dtype)
    steps_a = noise.sigma_ab * sqdt * jax.random.normal(k_ba, (n_i, 3), dtype)
    gt_bg = jnp.cumsum(steps_g.at[0].set(0.0), axis=0)
    gt_ba = jnp.cumsum(steps_a.at[0].set(0.0), axis=0)
    imu_w = truth.imu_w_true + gt_bg + noise.sigma_w / sqdt * jax.random.normal(k_w, (n_i, 3), dtype)
    imu_a = truth.imu_a_true + gt_ba + noise.sigma_a / sqdt * jax.random.normal(k_a, (n_i, 3), dtype)
    valid_obs = (truth.obs_id >= 0)[..., None]
    obs_uv = truth.obs_uv_true + noise.sigma_pix * jax.random.normal(k_px, truth.obs_uv_true.shape, dtype) * valid_obs
    gt_bg_cam = jax.vmap(lambda t: _interp(truth.imu_t, gt_bg, t))(truth.cam_t_imu)
    gt_ba_cam = jax.vmap(lambda t: _interp(truth.imu_t, gt_ba, t))(truth.cam_t_imu)
    return truth._replace(
        imu_w=imu_w, imu_a=imu_a, gt_bg=gt_bg, gt_ba=gt_ba,
        obs_uv=obs_uv, gt_bg_cam=gt_bg_cam, gt_ba_cam=gt_ba_cam,
    )
