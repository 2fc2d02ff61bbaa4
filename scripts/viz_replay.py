"""Offline visualization dashboard — the ROS1Visualizer/rviz analogue.

The reference publishes live rviz topics (pose/path, feature clouds, plane
meshes, AR overlays — ros/ROS1Visualizer.cpp:48-182,1051-1660). Headless
TPU hosts have no rviz; this renders the same content as a static dashboard:

  page 1  top-down + 3D trajectory (estimate vs ground truth), plane map
          wireframes (CP states), SLAM/MSCKF feature cloud
  page 2  per-axis orientation/position errors with ±3σ covariance envelopes
          (the RMSE/NEES plots of ROS1Visualizer.cpp:820-880)
  page 3  per-stage timing + estimator activity counters

Usage:
  python scripts/viz_replay.py [--duration 20] [--use-planes] [--out viz_out]
"""

import argparse
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from ov_plane_tpu.eval.metrics import ori_pos_errors
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def plane_wireframe(cp, half=1.5):
    """Square wireframe segments for a CP plane (publish_planes analogue)."""
    d = np.linalg.norm(cp)
    n = cp / max(d, 1e-9)
    a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(n, a)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    c = n * d
    corners = [c + half * (su * u + sv * v) for su, sv in [(-1, -1), (1, -1), (1, 1), (-1, 1)]]
    return corners + [corners[0]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--use-planes", action="store_true")
    ap.add_argument("--max-slam", type=int, default=10)
    ap.add_argument("--out", default="viz_out")
    args = ap.parse_args()

    cfg = sim_config()
    cfg.sim.traj_duration = args.duration
    cfg.state.max_slam_features = args.max_slam
    cfg.state.use_plane_constraint = args.use_planes
    cfg.state.use_plane_slam_feats = args.use_planes
    cfg.num_pts = 25
    cfg.num_pts_plane = 40 if args.use_planes else 0

    print("[viz] building sim + replaying...", flush=True)
    sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
                               v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    final_state, final_bank, outs = run_sequence(eng, state, bank, sim,
                                                 imu_window=cfg.tpu.max_imu_per_frame)

    t = np.asarray(outs.t)
    p = np.asarray(outs.p)
    gt_p = np.asarray(sim.gt_p[1:])
    e_ori, e_pos = (np.asarray(x) for x in ori_pos_errors(
        outs.q, outs.p, sim.gt_q[1:], sim.gt_p[1:]))
    sig = np.sqrt(np.asarray(outs.cov_diag_imu))
    os.makedirs(args.out, exist_ok=True)

    # ---- page 1: map view -------------------------------------------------
    fig = plt.figure(figsize=(13, 6))
    ax = fig.add_subplot(1, 2, 1)
    ax.plot(gt_p[:, 0], gt_p[:, 1], "k--", lw=1, label="ground truth")
    ax.plot(p[:, 0], p[:, 1], "tab:blue", lw=1.2, label="estimate")
    for cp in np.asarray(final_state.plane_cp)[np.asarray(final_state.plane_active)]:
        w = np.array(plane_wireframe(cp))
        ax.plot(w[:, 0], w[:, 1], "tab:green", lw=0.8, alpha=0.8)
    fp = np.asarray(sim.feat_p)
    ax.scatter(fp[:, 0], fp[:, 1], s=2, c="gray", alpha=0.4, label="map points")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title("top-down: trajectory + plane states")
    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    ax3.plot(gt_p[:, 0], gt_p[:, 1], gt_p[:, 2], "k--", lw=1)
    ax3.plot(p[:, 0], p[:, 1], p[:, 2], "tab:blue", lw=1.2)
    for cp in np.asarray(final_state.plane_cp)[np.asarray(final_state.plane_active)]:
        w = np.array(plane_wireframe(cp))
        ax3.plot(w[:, 0], w[:, 1], w[:, 2], "tab:green", lw=0.8)
    ax3.set_title("3D")
    fig.savefig(os.path.join(args.out, "trajectory.png"), dpi=110, bbox_inches="tight")
    plt.close(fig)

    # ---- page 2: error / covariance consistency ---------------------------
    fig, axes = plt.subplots(2, 3, figsize=(13, 6), sharex=True)
    labels = ["roll", "pitch", "yaw"]
    for i in range(3):
        axes[0, i].plot(t, np.degrees(e_ori[:, i]), "tab:blue", lw=0.8)
        env = 3 * np.degrees(sig[:, i])
        axes[0, i].plot(t, env, "r--", lw=0.7)
        axes[0, i].plot(t, -env, "r--", lw=0.7)
        axes[0, i].set_title(f"{labels[i]} err (deg) ±3σ")
        axes[1, i].plot(t, e_pos[:, i], "tab:blue", lw=0.8)
        env = 3 * sig[:, 3 + i]
        axes[1, i].plot(t, env, "r--", lw=0.7)
        axes[1, i].plot(t, -env, "r--", lw=0.7)
        axes[1, i].set_title(f"{'xyz'[i]} err (m) ±3σ")
        axes[1, i].set_xlabel("t (s)")
    fig.savefig(os.path.join(args.out, "errors.png"), dpi=110, bbox_inches="tight")
    plt.close(fig)

    # ---- page 3: estimator activity ---------------------------------------
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.4))
    axes[0].plot(t, np.asarray(outs.n_msckf_used), lw=0.8, label="msckf feats")
    axes[0].plot(t, np.asarray(outs.n_bank), lw=0.8, label="bank tracks")
    axes[0].legend(fontsize=8)
    axes[0].set_title("feature counts")
    axes[1].plot(t, np.asarray(outs.n_slam), lw=0.8, label="slam")
    axes[1].plot(t, np.asarray(outs.n_planes), lw=0.8, label="planes")
    axes[1].legend(fontsize=8)
    axes[1].set_title("state landmarks")
    axes[2].plot(t, np.asarray(outs.n_clones), lw=0.8)
    axes[2].set_title("clone window")
    for a in axes:
        a.set_xlabel("t (s)")
    fig.savefig(os.path.join(args.out, "activity.png"), dpi=110, bbox_inches="tight")
    plt.close(fig)

    rmse_o = float(np.sqrt(np.mean(np.sum(e_ori**2, 1)))) * 180 / np.pi
    rmse_p = float(np.sqrt(np.mean(np.sum(e_pos**2, 1))))
    print(f"[viz] RMSE {rmse_o:.3f} deg / {rmse_p:.3f} m over {len(t)} frames")
    print(f"[viz] wrote {args.out}/trajectory.png, errors.png, activity.png")


if __name__ == "__main__":
    main()
