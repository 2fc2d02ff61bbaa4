"""Algorithm-variant sweep over simulated sequences — the reference's
dataset-regression protocol (results/run_simulation.sh:73-99 ×
results/sim_general/plot.sh) as one script.

Variants follow the reference naming (results/run_ros_eth.sh:86-99):

  M-PT    mono, points only (MSCKF)
  MS-PT   mono + SLAM landmarks
  M-PL    mono + CP planes & point-on-plane constraints
  MS-PL   mono + SLAM + planes

Each variant runs N Monte-Carlo seeds as ONE vmapped batch (the reference
runs twenty sequential roslaunch processes) and records per-seed TUM
trajectories in the ov_eval folder layout:

  <out>/truths/<seq>.txt
  <out>/algorithms/<variant>/<seq>/estimate_<k>.txt

so `python scripts/ov_eval.py error_comparison <out>/truths
<out>/algorithms/*` reproduces the reference's comparison table; the table
is also printed directly at the end.

Usage:
  python scripts/run_sweep.py --out /tmp/ovp_sweep --seeds 10 --duration 30
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"
os.environ.setdefault("OVP_DISABLE_PALLAS", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.eval.io import write_tum
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
from ov_plane_tpu.sim.simulator import NoiseParams, apply_noise, build_sim
from ov_plane_tpu.utils.config import sim_config

VARIANTS = {
    # name -> (max_slam, use_planes)
    "M-PT": (0, False),
    "MS-PT": (12, False),
    "M-PL": (0, True),
    "MS-PL": (12, True),
}


def make_config(duration, traj_path, max_slam, use_planes):
    cfg = sim_config()
    cfg.sim.traj_duration = duration
    cfg.sim.traj_path = traj_path
    cfg.state.max_slam_features = max_slam
    cfg.state.use_plane_constraint = use_planes
    cfg.state.use_plane_slam_feats = use_planes
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 40
    cfg.num_pts_plane = 40 if use_planes else 0
    cfg.tpu.max_features = 192
    cfg.tpu.max_obs_per_frame = 96
    cfg.tpu.max_msckf_update = 40
    return cfg


def run_variant(cfg, seeds):
    """Batched replay; returns (t [F], p [S,F,3], q [S,F,4], gt_p, gt_q)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    accel = jax.devices()[0]
    use_f32 = accel.platform not in ("cpu",)
    dt = jnp.float32 if use_f32 else jnp.float64
    if use_f32:
        cfg.tpu.use_info_compression = True
        sim = jax.tree.map(lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, sim)
    sim = jax.device_put(sim, accel)
    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=1.0 / cfg.sim.freq_imu,
    )
    eng = VioEngine.from_config(cfg)

    def one_seed(key):
        sim_k = apply_noise(sim, key, noise)
        state = init_state_with_gt(
            eng, cfg, t0=sim_k.cam_t_imu[0], q0=sim_k.gt_q[0], p0=sim_k.gt_p[0],
            v0=sim_k.gt_v[0], bg0=sim_k.gt_bg_cam[0], ba0=sim_k.gt_ba_cam[0], dtype=dt,
        )
        bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=dt)
        _, _, outs = run_sequence(eng, state, bank, sim_k, imu_window=cfg.tpu.max_imu_per_frame)
        return outs.p, outs.q

    keys = jax.random.split(jax.random.PRNGKey(5), seeds)
    p, q = jax.jit(jax.vmap(one_seed))(keys)
    jax.block_until_ready(p)
    t = np.asarray(sim.cam_t_imu[1:], np.float64)
    return (t, np.asarray(p, np.float64), np.asarray(q, np.float64),
            np.asarray(sim.gt_p[1:], np.float64), np.asarray(sim.gt_q[1:], np.float64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ovp_sweep")
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--seq", default="", help="trajectory txt to replay "
                    "(e.g. the reference's data/udel_arl.txt); procedural room scan if empty")
    ap.add_argument("--variants", default=",".join(VARIANTS),
                    help="comma-separated subset of " + ",".join(VARIANTS))
    args = ap.parse_args()

    seq_name = os.path.splitext(os.path.basename(args.seq))[0] if args.seq else "room_scan"
    truths = os.path.join(args.out, "truths")
    os.makedirs(truths, exist_ok=True)

    wrote_gt = False
    for name in args.variants.split(","):
        max_slam, use_planes = VARIANTS[name.strip()]
        cfg = make_config(args.duration, args.seq, max_slam, use_planes)
        print(f"[sweep] {name}: {args.seeds} seeds on {seq_name} "
              f"(slam={max_slam}, planes={use_planes})", flush=True)
        t, p, q, gt_p, gt_q = run_variant(cfg, args.seeds)
        if not wrote_gt:
            write_tum(os.path.join(truths, seq_name + ".txt"), t, gt_p, gt_q)
            wrote_gt = True
        seq_dir = os.path.join(args.out, "algorithms", name.strip(), seq_name)
        os.makedirs(seq_dir, exist_ok=True)
        for k in range(args.seeds):
            write_tum(os.path.join(seq_dir, f"estimate_{k}.txt"), t, p[k], q[k])

    # Print the comparison table (plot.sh analogue) via the ov_eval CLI code.
    import importlib.util

    # ov_eval.py re-execs itself when PALLAS_AXON_POOL_IPS is set (TPU-claim
    # guard); neutralize before exec_module or it would replace THIS process.
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    spec = importlib.util.spec_from_file_location(
        "ov_eval_cli", os.path.join(os.path.dirname(__file__), "ov_eval.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    algo_dirs = [os.path.join(args.out, "algorithms", v.strip())
                 for v in args.variants.split(",")]
    cli.cmd_error_comparison(argparse.Namespace(paths=[truths] + algo_dirs))


if __name__ == "__main__":
    main()
