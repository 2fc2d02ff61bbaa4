"""Plane-cluster stage diagnostics: for each frame of the textured synthetic
scene, print how many features survive each stage of PlaneTracker.update —
norm-history depth, avg-norm gates, Delaunay neighbor matching — plus the
per-plane support histogram. Identifies the binding gate when image-driven
CP-plane init fails to reach plane_init_min_feat.

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
      python scripts/diag_plane_cluster.py [--frames 40]
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

from ov_plane_tpu.frontend.pipeline import VisionPipeline
from ov_plane_tpu.frontend.synthetic import render_frame_textured
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, step
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim, generate_planes
from ov_plane_tpu.sim.trajectory import get_trajectory
from ov_plane_tpu.utils.config import sim_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--freq-cam", type=float, default=20.0)
    ap.add_argument("--min-feat", type=int, default=8)
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
    cfg.sim.min_feature_gen_distance = 0.7
    cfg.sim.max_feature_gen_distance = 2.0
    sim = build_sim(cfg, max_obs=64)
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

    for i in range(1, min(args.frames, sim.cam_t_imu.shape[0] - 1) + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        img = render_frame_textured(planes.corners, planes.normal, planes.d,
                                    feat_p, R_GtoI, np.asarray(sim.gt_p[i]),
                                    R_ItoC, p_IinC, zeta, cfg.cam_wh, blobs=False)
        start = int(sim.imu_window_start[i])
        end = min(start + cfg.tpu.max_imu_per_frame, len(imu_t))
        obs = pipe.process_image(img, state, bank,
                                 imu_t=imu_t[start:end], imu_w=imu_w[start:end],
                                 t_new=float(sim.cam_t_imu[i]))
        frame = pipe.make_frame(obs, imu_t[start:end], imu_w[start:end],
                                imu_a[start:end], float(sim.cam_t_imu[i]))
        state, bank, out = step(eng, state, bank, frame)

        trk = pipe.fe.plane_tracker
        n_hist = len(trk.feat_norms)
        n_deep = sum(1 for v in trk.feat_norms.values() if len(v) >= tp.min_norms)
        avg_ok = sum(1 for fid, v in trk.feat_norms.items()
                     if len(v) >= tp.min_norms and np.linalg.norm(trk._avg_norm(v)) > 0)
        n_tris = len(trk.last_viz.get("tris", []))
        f2p = trk.feat_to_plane
        from collections import Counter
        supp = Counter(f2p.values())
        # Also: how accurate are the avg normals vs the true wall normals?
        errs = []
        for fid, v in trk.feat_norms.items():
            if len(v) < tp.min_norms:
                continue
            a = trk._avg_norm(v)
            if np.linalg.norm(a) <= 0:
                continue
            best = min(np.degrees(np.arccos(np.clip(abs(a @ n), -1, 1)))
                       for n in np.asarray(planes.normal))
            errs.append(best)
        err_med = float(np.median(errs)) if errs else float("nan")
        print(f"frame {i:3d}: hist={n_hist:3d} deep={n_deep:3d} avg_ok={avg_ok:3d} "
              f"tris={n_tris:3d} nerr_med={err_med:5.1f}deg "
              f"f2p={len(f2p):2d} supp={sorted(supp.values(), reverse=True)[:4]} "
              f"planes_state={int(out.n_planes)}")


if __name__ == "__main__":
    main()
