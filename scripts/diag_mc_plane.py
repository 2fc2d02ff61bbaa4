"""Single-stream diagnosis of an MC-vision cell's plane machinery.

Replays one seed of a `run_mc_vision` cell (same scene protocol, same noise
model) at B=1 and reports, every N frames: position error, the host plane
tracker's label population, how many bank features carry plane ids, the
state's active CP planes, and each active plane's CP error against the
simulator's ground-truth planes vs its filter 3σ.

This is the tool that localized the round-4 MC findings (BASELINE.md):
tabletop's initialized plane is honest (CP error well inside 3σ) while
position degrades — pointing at the out-of-state grouped updates — and
corridor's ON ≡ OFF bit-exact cells (no labels survive to the filter).

Usage (CPU f64 is the debug configuration):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/diag_mc_plane.py --scene tabletop --max-frames 250
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import cache_dir_for
jax.config.update("jax_compilation_cache_dir", cache_dir_for("bench"))

import jax.numpy as jnp
import numpy as np

from run_mc_vision import render_frames, scene_config

from ov_plane_tpu.frontend.fused import FusedVisionDriver
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.parallel.ingest import Prefetcher
from ov_plane_tpu.sim.simulator import NoiseParams, apply_noise, build_sim, generate_planes
from ov_plane_tpu.sim.trajectory import get_trajectory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="tabletop",
                    choices=["tabletop", "room", "corridor", "lowtex"])
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--max-frames", type=int, default=250)
    ap.add_argument("--img-noise", type=float, default=0.01)
    ap.add_argument("--every", type=int, default=25)
    ap.add_argument("--no-planes", action="store_true")
    ap.add_argument("--adaptive-sigma", action="store_true")
    args = ap.parse_args()

    dt = jnp.float64
    cfg, render = scene_config(args.scene, args.dense)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    n = min(int(sim.cam_t_imu.shape[0]) - 1, args.max_frames)
    frames = render_frames(cfg, sim, render, n, scene=args.scene, dense=args.dense)

    _, traj_pos, _ = get_trajectory(cfg.sim)
    planes_gt = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)
    cp_gt = np.asarray(planes_gt.normal) * np.asarray(planes_gt.d)[:, None]
    print(f"[diag] {cp_gt.shape[0]} gt planes")

    if args.adaptive_sigma:
        cfg.tpu.sigma_c_adaptive = True
    cfg.state.use_plane_constraint = not args.no_planes
    cfg.state.use_plane_slam_feats = not args.no_planes
    eng = VioEngine.from_config(cfg)
    drv = FusedVisionDriver(cfg, eng)
    fev = drv.init_frontend()
    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=1.0 / cfg.sim.freq_imu)
    key = jax.random.split(jax.random.PRNGKey(args.seed), 4)[0]
    with jax.default_device(cpu):
        s = apply_noise(sim, key, noise)
    state = init_state_with_gt(
        eng, cfg, t0=s.cam_t_imu[0], q0=s.gt_q[0], p0=s.gt_p[0], v0=s.gt_v[0],
        bg0=s.gt_bg_cam[0], ba0=s.gt_ba_cam[0], dtype=dt)
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=dt)
    imu_w = np.asarray(s.imu_w)
    imu_a = np.asarray(s.imu_a)
    imu_t = np.asarray(sim.imu_t)
    W = cfg.tpu.max_imu_per_frame
    Hh, Ww = cfg.cam_wh[1], cfg.cam_wh[0]
    rng = np.random.default_rng(args.seed + 999)
    lay = eng.layout

    def noisy(i):
        x = frames[i - 1]
        if args.img_noise > 0:
            x = x + rng.normal(0.0, args.img_noise, (Hh, Ww))
        x = np.clip(x, 0.0, 1.0)
        return np.rint(x * np.float32(255.0)).astype(np.float32) * np.float32(1.0 / 255.0)

    img_iter = Prefetcher((noisy(i) for i in range(1, n + 1)),
                          stage=drv.stage_image, depth=2)
    for i in range(1, n + 1):
        s0 = int(sim.imu_window_start[i])
        it = np.full(W, np.inf)
        iw = np.zeros((W, 3))
        ia = np.zeros((W, 3))
        m = len(imu_t[s0:s0 + W])
        it[:m] = imu_t[s0:s0 + W]
        iw[:m] = imu_w[s0:s0 + W]
        ia[:m] = imu_a[s0:s0 + W]
        state, bank, fev, out = drv.step_stream(
            state, bank, fev, next(img_iter), it, iw, ia, float(sim.cam_t_imu[i]))
        if i % args.every == 0 or i == n:
            tr = drv.trackers[0]
            npl = len(set(tr._plane[tr._plane >= 0].tolist()))
            lbl = int(np.sum(np.asarray(drv._label_pid[0]) >= 0))
            bank_pl = int(np.sum(np.asarray(bank.planeid) >= 0))
            perr = np.linalg.norm(np.asarray(state.imu[4:7]) - np.asarray(s.gt_p[i]))
            cnt = drv.last_counters[0]
            line = (f"f{i:3d} |perr|={perr:.4f} host_planes={npl} labels={lbl} "
                    f"bank_pid={bank_pl} state_planes="
                    f"{int(np.asarray(state.plane_active).sum())} "
                    f"init={int(cnt[0])} constr={int(cnt[1])}")
            # Signed point-to-gt-plane distance of this frame's triangulated
            # points (frontend output BEFORE any plane machinery): a nonzero
            # MEAN is a common-mode triangulation bias — information the
            # constraint rows then inject coherently into the filter.
            ids_t, _, p3_t, ok_t = drv.last_tri[0]
            sel = ok_t & (ids_t >= 0)
            if sel.any():
                pts_t = np.asarray(p3_t)[sel]
                n_gt = np.asarray(planes_gt.normal)
                d_gt = np.asarray(planes_gt.d)
                dists = pts_t @ n_gt.T - d_gt[None, :]          # [N, P] signed
                j_near = np.argmin(np.abs(dists), axis=1)
                sd = dists[np.arange(len(pts_t)), j_near]
                line_tri = (f" tri_bias={sd.mean():+.4f}±{sd.std():.4f}"
                            f" (n={len(sd)})")
            else:
                line_tri = " tri_bias=n/a"
            line += line_tri
            cps = np.asarray(state.plane_cp)
            cov_d = np.asarray(jnp.diag(state.cov))
            for pslot in np.where(np.asarray(state.plane_active))[0]:
                d = np.linalg.norm(cp_gt - cps[pslot][None], axis=1)
                j = int(np.argmin(d))
                base = lay.plane_base + 3 * pslot
                sig = np.sqrt(np.abs(cov_d[base:base + 3]))
                line += (f" | s{pslot} cp_err={d[j]:.4f}(gt{j}) "
                         f"3sig={3 * np.linalg.norm(sig):.4f}")
            print(line, flush=True)
    drv.flush_stream()


if __name__ == "__main__":
    main()
