"""End-to-end simulated VIO run (BASELINE.json config 1: point-only MSCKF).

Builds the simulator, initializes from ground truth, replays the sequence
under lax.scan, and prints RMSE/NEES (the reference's consistency metrics,
ROS1Visualizer.cpp:846-880 / run_simulation.cpp flow).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

from ov_plane_tpu.eval.metrics import rmse_nees
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--freq-cam", type=float, default=0.0, help="override sim camera rate")
    ap.add_argument("--max-slam", type=int, default=0)
    ap.add_argument("--num-pts", type=int, default=80)
    ap.add_argument("--num-pts-plane", type=int, default=0)
    ap.add_argument("--max-features", type=int, default=256)
    ap.add_argument("--max-obs", type=int, default=160)
    ap.add_argument("--use-planes", action="store_true")
    args = ap.parse_args()

    cfg = sim_config()
    cfg.sim.traj_duration = args.duration
    if args.freq_cam > 0:
        cfg.sim.freq_cam = args.freq_cam
    cfg.state.max_slam_features = args.max_slam
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.state.use_plane_constraint = args.use_planes
    cfg.state.use_plane_slam_feats = args.use_planes
    cfg.num_pts = args.num_pts
    cfg.num_pts_plane = args.num_pts_plane
    cfg.tpu.max_features = args.max_features
    cfg.tpu.max_obs_per_frame = args.max_obs

    print("[sim] building...", flush=True)
    t0 = time.time()
    sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    print(f"[sim] built in {time.time()-t0:.1f}s: {sim.feat_p.shape[0]} map feats, "
          f"{sim.cam_t_imu.shape[0]} frames, {sim.imu_t.shape[0]} imu samples", flush=True)

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg,
        t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)

    print("[run] compiling + running...", flush=True)
    t0 = time.time()
    state, bank, outs = run_sequence(eng, state, bank, sim, imu_window=cfg.tpu.max_imu_per_frame)
    outs.t.block_until_ready()
    wall = time.time() - t0
    n_frames = int(outs.t.shape[0])
    print(f"[run] {n_frames} frames in {wall:.1f}s ({n_frames/wall:.1f} fps incl. compile)", flush=True)

    # Second run for steady-state rate.
    state2 = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank2 = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    t0 = time.time()
    _, _, outs2 = run_sequence(eng, state2, bank2, sim, imu_window=cfg.tpu.max_imu_per_frame)
    outs2.t.block_until_ready()
    wall2 = time.time() - t0
    print(f"[run] steady-state: {n_frames/wall2:.1f} fps", flush=True)

    # Metrics vs gt (frames 1..N).
    gt_q = sim.gt_q[1:]
    gt_p = sim.gt_p[1:]
    cov = outs.cov_diag_imu
    m = rmse_nees(outs.q, outs.p, cov[:, 0:3], cov[:, 3:6], gt_q, gt_p)
    print("metrics:", {k: float(v) for k, v in m.items()})

    # Per-segment diagnostics.
    for frac in (0.25, 0.5, 0.75, 1.0):
        i = int(n_frames * frac) - 1
        e_p = np.linalg.norm(np.asarray(outs.p[i]) - np.asarray(gt_p[i]))
        print(f"  t={float(outs.t[i]):6.2f}s pos_err={e_p:.4f}m "
              f"msckf_used={int(outs.n_msckf_used[i])} bank={int(outs.n_bank[i])} "
              f"clones={int(outs.n_clones[i])} slam={int(outs.n_slam[i])} planes={int(outs.n_planes[i])}")

    assert float(m["rmse_pos"]) < 1.0, "position RMSE diverged"
    print("OK")


if __name__ == "__main__":
    main()
