"""Frontend gate diagnostics on the synthetic close-range scene.

Prints, per frame: which triangulation gate (maturity / condition / depth /
ray-RMS) passes how many tracks, the plane-tracker association count, and the
feature bank's per-plane support — the numbers that explain why image-based
plane detection holds or drops. Used to calibrate the ray-RMS gate
(max_ray_rms_abs absorbs the pose-drift ray miss; see TrackPlaneOptions).

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
      python scripts/diag_frontend_gates.py [--frames 35]
"""

import argparse
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend.pipeline import VisionPipeline, solve_track_triangulations
from ov_plane_tpu.frontend.synthetic import render_frame
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.jacobians import clone_set_from_state
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, step
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=35)
    ap.add_argument("--close-range", action=argparse.BooleanOptionalAction, default=True,
                    help="--no-close-range keeps the default 2-5 m feature range")
    ap.add_argument("--textured", action="store_true",
                    help="raycast-textured room render (the run_euroc synthetic "
                         "path) instead of isolated blobs")
    ap.add_argument("--imu", action="store_true",
                    help="pass the IMU window to process_image (gyro LK prior "
                         "+ 2-pt RANSAC gate), as run_euroc does")
    ap.add_argument("--min-feat", type=int, default=8,
                    help="plane_init_min_feat for the state-side CP init")
    ap.add_argument("--freq-cam", type=float, default=20.0,
                    help="camera rate (EuRoC runs 20 Hz)")
    ap.add_argument("--blobs", action=argparse.BooleanOptionalAction, default=False,
                    help="overlay feature blobs in --textured mode (default "
                         "off: FAST detects on the world-anchored plane "
                         "texture itself)")
    args = ap.parse_args()

    cfg = sim_config()
    cfg.sim.traj_duration = 6.0
    cfg.sim.freq_cam = args.freq_cam
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.plane_init_min_feat = args.min_feat
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 15
    cfg.num_pts_plane = 40
    cfg.cam_wh = [640, 480]
    cfg.cam_intrinsics = [300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    cfg.trackplane.min_norms = 3
    cfg.trackplane.max_norm_avg_var = 30.0
    cfg.trackplane.max_norm_avg_max = 30.0
    cfg.msckf_options.chi2_multipler = 5.0
    if args.close_range:
        cfg.sim.min_feature_gen_distance = 0.7
        cfg.sim.max_feature_gen_distance = 2.0
    sim = build_sim(cfg, max_obs=64)
    planes = None
    if args.textured:
        from ov_plane_tpu.frontend.synthetic import render_frame_textured
        from ov_plane_tpu.sim.simulator import generate_planes
        from ov_plane_tpu.sim.trajectory import get_trajectory

        _, traj_pos, _ = get_trajectory(cfg.sim)
        planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0],
                               p0=sim.gt_p[0], v0=sim.gt_v[0],
                               bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    pipe = VisionPipeline(cfg, eng)

    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    tp = cfg.trackplane

    n_assoc = 0
    deaths_border, deaths_interior, death_ages = 0, 0, []
    for i in range(1, min(args.frames, sim.cam_t_imu.shape[0] - 1) + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        if args.textured:
            img = render_frame_textured(planes.corners, planes.normal, planes.d,
                                        feat_p, R_GtoI, np.asarray(sim.gt_p[i]),
                                        R_ItoC, p_IinC, zeta, cfg.cam_wh,
                                        blobs=args.blobs)
        else:
            img = render_frame(feat_p, R_GtoI, np.asarray(sim.gt_p[i]), R_ItoC,
                               p_IinC, zeta, cfg.cam_wh)
        prev_valid = pipe.fe.valid.copy()
        prev_uv = pipe.fe.uv.copy()
        prev_ids = pipe.fe.ids.copy()
        prev_age = pipe.fe.tri_n.copy()
        start0 = int(sim.imu_window_start[i])
        end0 = min(start0 + cfg.tpu.max_imu_per_frame, len(imu_t))
        if args.imu:
            obs = pipe.process_image(img, state, bank,
                                     imu_t=imu_t[start0:end0], imu_w=imu_w[start0:end0],
                                     t_new=float(sim.cam_t_imu[i]))
        else:
            obs = pipe.process_image(img, state, bank)
        died = prev_valid & (~pipe.fe.valid | (pipe.fe.ids != prev_ids))
        if died.any():
            u = prev_uv[died]
            border = ((u[:, 0] < 25) | (u[:, 0] > cfg.cam_wh[0] - 25)
                      | (u[:, 1] < 25) | (u[:, 1] > cfg.cam_wh[1] - 25))
            deaths_border += int(border.sum())
            deaths_interior += int((~border).sum())
            death_ages.extend(prev_age[died].tolist())
        n_assoc += int(jnp.sum(obs[2] >= 0))
        start = int(sim.imu_window_start[i])
        end = min(start + cfg.tpu.max_imu_per_frame, len(imu_t))
        frame = pipe.make_frame(obs, imu_t[start:end], imu_w[start:end],
                                imu_a[start:end], float(sim.cam_t_imu[i]))
        state, bank, out = step(eng, state, bank, frame)

        fe = pipe.fe
        enough = fe.valid & (fe.tri_n >= tp.feat_init_min_obs)
        line = f"frame {i:3d}: mature={int(enough.sum()):3d}"
        if enough.any() and int(state.num_clones) >= 1:
            cl = clone_set_from_state(state)
            newest = int(np.asarray(state.newest_clone_slot))
            # Same math the pipeline uses (shared helper — no drift risk).
            g = solve_track_triangulations(
                fe, tp, np.asarray(cl.R_GtoC[newest]), np.asarray(cl.p_CinG[newest]))
            e, cond, depth, rms, gate = (g["enough"], g["cond"], g["depth"],
                                         g["ray_rms"], g["rms_gate"])
            line += (f" cond_ok={int((e & (cond <= tp.max_cond_number)).sum()):3d}"
                     f" depth_ok={int((e & (depth >= tp.min_dist) & (depth <= tp.max_dist)).sum()):3d}"
                     f" rms_ok={int((e & (rms <= gate)).sum()):3d}"
                     f" rms_med={np.median(rms[e]):.3f}")
        pids = np.asarray(bank.planeid)
        act = np.asarray(bank.fid) >= 0
        vals, cnts = np.unique(pids[act & (pids >= 0)], return_counts=True)
        top = sorted(zip(cnts.tolist(), vals.tolist()), reverse=True)[:2]
        line += (f" f2p={len(pipe.fe.plane_tracker.feat_to_plane):2d}"
                 f" bank_support={top} planes_state={int(out.n_planes)}")
        print(line)
    print(f"TOTAL associations: {n_assoc}")
    a = np.asarray(death_ages) if death_ages else np.zeros(0)
    print(f"track deaths: {deaths_border} border (FOV exit), {deaths_interior} interior; "
          f"ages: young(<4)={int((a < 4).sum())} mid(4-10)={int(((a >= 4) & (a < 10)).sum())} "
          f"old(>=10)={int((a >= 10).sum())}")
    # Measured on the synthetic renderer: ~86% of deaths are age-0 fresh
    # detections failing their FIRST inter-frame track (appearance change),
    # while mature tracks are stable — the churn ceiling on concurrent
    # co-planar support, hence on image-derived CP-plane initialization.


if __name__ == "__main__":
    main()
