"""Export a simulated sequence as a EuRoC/ASL folder.

Builds `<out>/mav0/{imu0,cam0,state_groundtruth_estimate0}` from the
deterministic simulator + synthetic renderer, so `scripts/run_euroc.py` (the
ros1_serial_msckf equivalent) can be exercised end-to-end — including its
static/dynamic initialization fallbacks — without the real dataset.

Usage:
  python scripts/make_synth_asl.py --out /tmp/synth_mav --duration 15 [--no-gt]
  python scripts/run_euroc.py --data /tmp/synth_mav
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

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend.synthetic import render_frame, render_frame_textured
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.sim.simulator import build_sim, generate_planes
from ov_plane_tpu.sim.trajectory import get_trajectory
from ov_plane_tpu.utils.config import sim_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--num-pts", type=int, default=60)
    ap.add_argument("--num-pts-plane", type=int, default=0,
                    help="environment points constrained to the cuboid-room "
                         "planes (exercises the vision plane frontend)")
    ap.add_argument("--no-gt", action="store_true",
                    help="omit the groundtruth csv (forces static/dynamic init)")
    ap.add_argument("--skip-start", type=float, default=0.0,
                    help="seconds of initial frames to drop (start in motion)")
    ap.add_argument("--freq-cam", type=float, default=20.0,
                    help="camera rate (EuRoC runs 20 Hz; below ~15 Hz the "
                         "inter-frame flow on this room-scan trajectory "
                         "exceeds any pyramidal tracker's basin)")
    ap.add_argument("--room-margin", type=float, default=1.0,
                    help="cuboid-room margin beyond the trajectory bbox "
                         "(sim_min_feature_gen_dist). Close walls (~1-1.5 m "
                         "viewing distance, like the reference's AR-Table "
                         "scenes) keep triangulation depth noise low enough "
                         "for normal-based plane clustering — depth error "
                         "grows with z².")
    ap.add_argument("--textured", action="store_true",
                    help="raycast-render the cuboid room with procedural "
                         "plane textures (realistic dense texture for "
                         "KLT/FAST) instead of isolated feature blobs")
    ap.add_argument("--blobs", action=argparse.BooleanOptionalAction, default=True,
                    help="--no-blobs drops the feature-blob overlays in "
                         "--textured mode: FAST then detects on the "
                         "world-anchored plane texture itself (the regime "
                         "where image-driven CP plane init fires)")
    ap.add_argument("--speckle-cells", nargs="+", default=["0.15"],
                    help="speckle layers, each 'cell' or 'cell:r_lo:r_hi' "
                         "(m, radii in cells); add a finer sharp layer "
                         "(e.g. 0.15 0.07:0.12:0.30) for corner density on "
                         "distant/oblique walls")
    ap.add_argument("--texture-cell", type=float, default=0.22,
                    help="world-space texture cell size (m) of the procedural "
                         "wall texture; smaller = finer texture = more FAST "
                         "corners at range")
    ap.add_argument("--traj-kind", default="room_scan",
                    help="procedural trajectory: room_scan | slow_scan | corridor")
    ap.add_argument("--world-offset", type=float, nargs=3, default=(0.0, 0.0, 0.0),
                    help="rigid world translation (scene away from the origin, "
                         "reference-dataset-like raw coordinates)")
    args = ap.parse_args()

    cfg = sim_config()
    cfg.sim.traj_duration = args.duration
    cfg.sim.traj_kind = args.traj_kind
    cfg.sim.world_offset = tuple(args.world_offset)
    cfg.num_pts = args.num_pts
    cfg.num_pts_plane = args.num_pts_plane
    cfg.sim.freq_cam = args.freq_cam
    cfg.sim.min_feature_gen_distance = args.room_margin
    sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)

    base = os.path.join(args.out, "mav0")
    os.makedirs(os.path.join(base, "imu0"), exist_ok=True)
    os.makedirs(os.path.join(base, "cam0", "data"), exist_ok=True)

    imu_t = np.asarray(sim.imu_t)
    keep = imu_t >= args.skip_start
    with open(os.path.join(base, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for t, w, a in zip(imu_t[keep], np.asarray(sim.imu_w)[keep], np.asarray(sim.imu_a)[keep]):
            f.write(f"{int(t * 1e9)}," + ",".join(f"{v:.9f}" for v in (*w, *a)) + "\n")

    import cv2

    zeta = np.asarray(cfg.cam_intrinsics)
    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    feat_p = np.asarray(sim.feat_p)
    cam_t = np.asarray(sim.cam_t_imu)
    if args.textured:
        _, traj_pos, _ = get_trajectory(cfg.sim)
        planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)
    n_img = 0
    with open(os.path.join(base, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for k, t in enumerate(cam_t):
            if t < args.skip_start:
                continue
            R = np.asarray(quat_2_rot(sim.gt_q[k]))
            if args.textured:
                img = render_frame_textured(
                    planes.corners, planes.normal, planes.d, feat_p, R,
                    np.asarray(sim.gt_p[k]), R_ItoC, p_IinC, zeta, cfg.cam_wh,
                    texture_cell=args.texture_cell,
                    speckle_cells=tuple(
                        float(sc) if ":" not in sc else tuple(float(v) for v in sc.split(":"))
                        for sc in args.speckle_cells),
                    blobs=args.blobs)
            else:
                img = render_frame(feat_p, R, np.asarray(sim.gt_p[k]), R_ItoC, p_IinC,
                                   zeta, cfg.cam_wh)
            name = f"{int(t * 1e9)}.png"
            cv2.imwrite(os.path.join(base, "cam0", "data", name),
                        (img * 255).astype(np.uint8))
            f.write(f"{int(t * 1e9)},{name}\n")
            n_img += 1

    if not args.no_gt:
        gdir = os.path.join(base, "state_groundtruth_estimate0")
        os.makedirs(gdir, exist_ok=True)
        with open(os.path.join(gdir, "data.csv"), "w") as f:
            f.write("#timestamp,p(3),q_wxyz(4),v(3),bw(3),ba(3)\n")
            for k, t in enumerate(cam_t):
                if t < args.skip_start:
                    continue
                q = np.asarray(sim.gt_q[k])          # JPL x,y,z,w (GtoI)
                # JPL q_GtoI shares components with Hamilton q_ItoG: reorder only.
                q_wxyz = [q[3], q[0], q[1], q[2]]     # Hamilton ItoG (w,x,y,z)
                row = [int(t * 1e9), *np.asarray(sim.gt_p[k]), *q_wxyz,
                       *np.asarray(sim.gt_v[k]), *np.asarray(sim.gt_bg_cam[k]),
                       *np.asarray(sim.gt_ba_cam[k])]
                f.write(",".join(str(v) if i == 0 else f"{v:.9f}" for i, v in enumerate(row)) + "\n")

    print(f"[synth-asl] wrote {n_img} frames + imu to {base} "
          f"(gt={'no' if args.no_gt else 'yes'}, start={args.skip_start}s)")


if __name__ == "__main__":
    main()
