"""Per-stage timing profile of the frame pipeline (reference timing-CSV protocol)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.sim.simulator import build_sim
from ov_plane_tpu.utils.config import sim_config
from ov_plane_tpu.utils.profiling import run_sequence_profiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--out", default="/tmp/ovp_timing.csv")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--trace", default="", help="also capture a jax.profiler "
                    "trace (XLA kernel timeline, viewable in TensorBoard/"
                    "Perfetto) into this directory")
    args = ap.parse_args()

    cfg = sim_config()
    cfg.sim.traj_duration = args.duration
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 40
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 80
    cfg.tpu.max_msckf_update = 32
    sim = build_sim(cfg, max_obs=80)

    eng = VioEngine.from_config(cfg)
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
        bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
    )
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)
    import contextlib

    ctx = jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        rec = run_sequence_profiled(eng, state, bank, sim, cfg.tpu.max_imu_per_frame,
                                    max_frames=args.frames)
    rec.write(args.out)
    print(f"wrote {args.out} ({len(rec.rows)} frames)")
    # Skip warmup rows (compiles) in the summary.
    rec.rows = rec.rows[5:]
    for stage, s in rec.summary().items():
        if s["max"] > 0:
            print(f"  {stage:15s} mean {s['mean']*1e3:7.2f} ms  p99 {s['p99']*1e3:7.2f} ms  max {s['max']*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
