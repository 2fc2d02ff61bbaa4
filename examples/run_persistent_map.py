"""Persistent plane map (BASELINE config 4): replay a plane-aided sim run
while accumulating triangulated on-plane features into the device-resident
MapBlocks store, then query it and render the AR wireframe onto a detected
plane (the reference's persistent plane map + teapot overlay,
ROS1Visualizer.cpp:1336-1520)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend import map_blocks as mb
from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.jacobians import clone_set_from_state
from ov_plane_tpu.models.manager import FrameData, VioEngine, init_state_with_gt, step
from ov_plane_tpu.ops.triangulation import TriangulationOptions, triangulate
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=12.0)
    args = ap.parse_args()

    cfg = sim_config()
    cfg.sim.traj_duration = args.duration
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 20
    cfg.num_pts_plane = 40
    cfg.tpu.max_features = 160
    cfg.tpu.max_obs_per_frame = 96
    cfg.tpu.max_msckf_update = 40
    sim = build_sim(cfg, max_obs=96)

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    pmap = mb.MapBlocks.create(capacity=4096, voxel=0.10)
    tri_opts = TriangulationOptions()

    W = cfg.tpu.max_imu_per_frame
    n_frames = int(sim.cam_t_imu.shape[0]) - 1
    for i in range(1, n_frames + 1):
        start = sim.imu_window_start[i]
        z = jnp.zeros((), start.dtype)
        frame = FrameData(
            imu_t=jax.lax.dynamic_slice(sim.imu_t, (start,), (W,)),
            imu_w=jax.lax.dynamic_slice(sim.imu_w, (start, z), (W, 3)),
            imu_a=jax.lax.dynamic_slice(sim.imu_a, (start, z), (W, 3)),
            t_new=sim.cam_t[i], obs_id=sim.obs_id[i], obs_uv=sim.obs_uv[i],
            obs_plane=sim.obs_plane[i],
        )
        state, bank, out = step(eng, state, bank, frame)

        # Every few frames: triangulate current on-plane tracks and insert.
        if i % 5 == 0 and int(state.num_clones) >= 5:
            clones = clone_set_from_state(state)
            on_plane = bank.active & (bank.planeid >= 0) & (bank.n_obs >= 3)
            masks = bank.mask & on_plane[:, None] & jnp.isfinite(state.clones_t)[None, :]
            p3, ok3 = triangulate(bank.uvn, masks, clones.R_GtoC, clones.p_CinG, tri_opts)
            pmap, n_ins = mb.insert(pmap, p3, bank.planeid, ok3 & on_plane)

    n_map = int(jnp.sum(pmap.active))
    print(f"[map] {n_map} persistent map points after {n_frames} frames")
    # Point-to-gt-plane consistency of the accumulated map.
    pts = np.asarray(pmap.points)[np.asarray(pmap.active)]
    pids = np.asarray(pmap.plane_id)[np.asarray(pmap.active)]
    cp_true = np.asarray(sim.plane_cp)
    dists = []
    for p, pid in zip(pts, pids):
        if 0 <= pid < len(cp_true):
            cp = cp_true[pid]
            n = cp / np.linalg.norm(cp)
            dists.append(abs(n @ p - np.linalg.norm(cp)))
    if dists:
        print(f"[map] point-to-plane |d|: mean {np.mean(dists):.3f} m, p90 {np.percentile(dists, 90):.3f} m")

    # KNN query against the map around the current position.
    d, idx = mb.knn(pmap, jnp.asarray([np.asarray(state.imu[4:7])]), 8)
    print(f"[map] 8-NN around current pose: {np.asarray(d).round(2)}")

    # AR overlay: project a wireframe onto the first active plane state.
    if bool(jnp.any(state.plane_active)):
        from ov_plane_tpu.eval.render import ar_anchor_in_view, rasterize_segments, wireframe_segments
        from ov_plane_tpu.ops.quat import quat_2_rot

        slot = int(jnp.argmax(state.plane_active))
        cp = np.asarray(state.plane_cp[slot])
        clones = clone_set_from_state(state)
        newest = int(state.newest_clone_slot)
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
        R_GtoC = np.asarray(clones.R_GtoC[newest])
        p_CinG = np.asarray(clones.p_CinG[newest])
        anchor = ar_anchor_in_view(cp, R_GtoC, p_CinG)
        segs = wireframe_segments(
            verts, faces, cp, 0.4, R_GtoC, p_CinG,
            np.asarray(cfg.cam_intrinsics), cfg.cam_wh, anchor=anchor,
        )
        img = rasterize_segments(segs, cfg.cam_wh)
        print(f"[ar] rendered {len(segs)} wireframe segments onto plane cp={cp.round(2)} "
              f"({int(img.sum())} px)")
    print("OK")


if __name__ == "__main__":
    main()
