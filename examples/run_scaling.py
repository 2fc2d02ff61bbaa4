"""Scaling-efficiency harness: batch replay over an expanding device mesh.

BASELINE.json target: >0.7 scaling efficiency at 2+ hosts via keyframe /
sequence partitioning. This harness runs B=devices Monte-Carlo instances of
the full filter data-parallel over a `seq` mesh axis and reports
throughput(k devices) / (k · throughput(1 device)).

On a CPU it exercises the sharding machinery (virtual device mesh); on a TPU
pod slice the same code measures real ICI-backed scaling.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.parallel.replay import batched_replay, make_mesh, replicate, shard_leading_axis
from ov_plane_tpu.sim.simulator import NoiseParams, apply_noise, build_sim
from ov_plane_tpu.utils.config import sim_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--per-device", type=int, default=2, help="sequences per device")
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

    sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=1.0 / cfg.sim.freq_imu,
    )
    eng = VioEngine.from_config(cfg)
    n_frames = int(sim.cam_t_imu.shape[0]) - 1
    devices = jax.devices()
    print(f"[scaling] {len(devices)} devices; {n_frames} frames/sequence")

    def instances(B):
        keys = jax.random.split(jax.random.PRNGKey(2), B)
        sims = jax.vmap(lambda k: apply_noise(sim, k, noise))(keys)
        # Per-instance init from (shared) gt.
        def mk(k):
            s = jax.tree.map(lambda x: x[k], sims)
            st = init_state_with_gt(
                eng, cfg, t0=s.cam_t_imu[0], q0=s.gt_q[0], p0=s.gt_p[0], v0=s.gt_v[0],
                bg0=s.gt_bg_cam[0], ba0=s.gt_ba_cam[0],
            )
            return st
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk(k) for k in range(B)])
        banks = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones) for _ in range(B)],
        )
        return states, banks, sims

    results = {}
    sizes = [k for k in (1, 2, 4, 8) if k <= len(devices)]
    for k in sizes:
        B = k * args.per_device
        mesh = make_mesh(k)
        states, banks, sims = instances(B)
        states = shard_leading_axis(states, mesh)
        banks = shard_leading_axis(banks, mesh)
        sims = shard_leading_axis(sims, mesh)

        from ov_plane_tpu.models.manager import run_sequence

        @jax.jit
        def run_all(states, banks, sims):
            def one(st, bk, s):
                _, _, outs = run_sequence(eng, st, bk, s, imu_window=cfg.tpu.max_imu_per_frame)
                return outs.p
            p = jax.vmap(one)(states, banks, sims)
            return p, jnp.sqrt(jnp.mean(jnp.sum((p - sims.gt_p[:, 1:]) ** 2, axis=-1)))

        with mesh:
            p, fleet = run_all(states, banks, sims)  # compile
            jax.block_until_ready(p)
            t0 = time.time()
            p, fleet = run_all(states, banks, sims)
            jax.block_until_ready(p)
            wall = time.time() - t0
        fps = B * n_frames / wall
        results[k] = fps
        print(f"  {k} device(s): B={B} → {fps:8.1f} frames/s (fleet RMSE {float(fleet):.3f} m)")

    base = results[sizes[0]]
    for k in sizes[1:]:
        eff = results[k] / (k * base)
        print(f"  scaling efficiency @ {k} devices: {eff:.2f}")
    if jax.default_backend() == "cpu":
        print("  NOTE: virtual CPU devices share the same physical cores —")
        print("  efficiency here validates the sharding machinery, not hardware scaling.")


if __name__ == "__main__":
    main()
