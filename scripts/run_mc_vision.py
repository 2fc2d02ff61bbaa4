"""Multi-seed Monte-Carlo sweep of the image-driven plane benefit (VERDICT r3 #2).

Round 3's plane-accuracy claims (tabletop −12…22% orientation, room −13%
sparse position) were single-seed. This runs the reference's MC protocol
(``results/run_simulation.sh:73-99`` — same world, re-noised measurements per
run) on the VISION scenes: B noise seeds × {tabletop, room, corridor} ×
{planes ON, OFF} × {dense, sparse}, through the full fused KLT/FAST/Delaunay/
CP-init/constraint path, and reports mean ± std posyaw ATE plus a paired-t
95% CI on the ON−OFF delta.

Seeds re-noise the *measurements* — per-stream IMU noise + bias walks
(``apply_noise`` from the noiseless truth streams, ≡ Simulator.cpp:355-382)
and per-frame per-stream image noise ahead of the camera's 8-bit ADC — while
the world/texture stays fixed, exactly the reference's MC design. ON and OFF
replay **identical** per-seed inputs (same rng), so each per-seed Δ is a
paired sample.

The B seeds run as ONE vmapped fused batch per variant (B streams on one
chip), so a 10-seed campaign costs about one single-seed replay of wall time.

Usage (one scene per invocation; ~10-20 min each on the v5e through the
tunnel, dominated by per-variant compiles the first time):
    python scripts/run_mc_vision.py --scene tabletop --out /tmp/mc_tabletop.json
    python scripts/run_mc_vision.py --scene room --out /tmp/mc_room.json
    python scripts/run_mc_vision.py --scene corridor --out /tmp/mc_corridor.json
"""

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

from ov_plane_tpu.eval.metrics import ate_posyaw
from ov_plane_tpu.frontend.fused import FusedVisionDriver
from ov_plane_tpu.frontend.synthetic import render_frame_textured
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt
from ov_plane_tpu.ops.quat import quat_2_rot
from ov_plane_tpu.parallel.ingest import Prefetcher
from ov_plane_tpu.sim.simulator import NoiseParams, apply_noise, build_sim, generate_planes
from ov_plane_tpu.sim.trajectory import get_trajectory
from ov_plane_tpu.utils.config import sim_config


def scene_config(scene: str, dense: bool):
    """The round-3 scene protocols, verbatim (BASELINE.md round-3 sections;
    run_euroc.py --sim-calib config assembly; tests/test_fused_planes.py
    tabletop render constants)."""
    cfg = sim_config()
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.histogram_method = "NONE"
    cfg.cam_wh = [640, 480]
    cfg.cam_intrinsics = [300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0]
    cfg.sim.freq_cam = 20.0
    # Renderer-noise whitening (calibration fact: synthetic KLT noise ~2 px).
    cfg.msckf_options.sigma_pix = 2.0
    cfg.slam_options.sigma_pix = 2.0
    cfg.msckf_options.chi2_multipler = 5.0
    cfg.num_pts = 150 if dense else 40
    cfg.num_pts_plane = 0
    cfg.tpu.max_obs_per_frame = 160 if dense else 80
    cfg.tpu.max_features = 2 * cfg.tpu.max_obs_per_frame
    cfg.tpu.max_msckf_update = 40 if dense else 24
    cfg.tpu.use_info_compression = True
    cfg.tpu.max_planes = 4

    render = {"texture_cell": 0.22, "speckle_cells": (0.15,), "blobs": False}
    if scene == "tabletop":
        cfg.sim.traj_kind = "tabletop"
        cfg.sim.traj_duration = 25.0
        cfg.sim.min_feature_gen_distance = 1.0
        # STOCK plane gates (reference defaults) — the round-3 protocol.
        render = {"texture_cell": 0.1,
                  "speckle_cells": ((0.05, 0.12, 0.30), 0.12), "blobs": False}
    elif scene == "room":
        cfg.sim.traj_kind = "room_scan"
        cfg.sim.traj_duration = 20.0
        cfg.sim.min_feature_gen_distance = 0.7
        _tuned_gates(cfg)
    elif scene == "corridor":
        cfg.sim.traj_kind = "corridor"
        cfg.sim.traj_duration = 30.0
        cfg.sim.min_feature_gen_distance = 1.0
        _tuned_gates(cfg)
    elif scene == "lowtex":
        # The regime planes exist for (VERDICT r4 next-round #1c): a
        # LOW-TEXTURE room. Walls carry only one coarse value-noise octave
        # (1 m cells — locally a featureless gradient that LK slides on, so
        # FAST finds nothing there) plus sparse high-contrast marks (the
        # speckle layers below). Trackable corners are the marks:
        # few, widely spaced, and plane-anchored — point geometry is weak
        # while plane clustering still gets coplanar support. Room margin
        # 1.2 m keeps the walls at 1.2-4 m (mid-range: neither the tabletop's
        # close-range regime nor the corridor's grazing geometry).
        cfg.sim.traj_kind = "room_scan"
        cfg.sim.traj_duration = 20.0
        cfg.sim.min_feature_gen_distance = 1.2
        cfg.num_pts = 50 if dense else 25
        cfg.tpu.max_obs_per_frame = 96 if dense else 64
        cfg.tpu.max_features = 2 * cfg.tpu.max_obs_per_frame
        cfg.tpu.max_msckf_update = 32 if dense else 20
        _tuned_gates(cfg)
        # Two sparse speckle layers: 4-8 cm marks (~2.4/m², the working-
        # distance corners) + 9-18 mm marks that the renderer's band-limit
        # fade removes beyond ~2 m (close flybys stay trackable). Measured
        # with the repo's own FAST scorer: ~35 distinct trackable marks per
        # frame (median, min 127 score-positive px) vs the room scene's
        # continuous texture — few, widely-spaced, plane-anchored corners,
        # i.e. the weak-point-geometry regime planes exist for.
        render = {"texture_cell": 1.0,
                  "speckle_cells": ((0.5, 0.08, 0.16), (0.15, 0.06, 0.12)),
                  "blobs": False}
    else:
        raise SystemExit(f"unknown scene {scene!r}")
    return cfg, render


def _tuned_gates(cfg):
    """run_euroc.py --sim-calib --use-planes tuned-gate block (the raw-global
    cond gate scales with scene-origin distance, PlaneFitting.cpp:59-66)."""
    cfg.state.plane_init_min_feat = 8
    cfg.trackplane.min_norms = 3
    cfg.trackplane.max_norm_avg_var = 30.0
    cfg.trackplane.max_norm_avg_max = 30.0
    cfg.state.plane_init_max_cond = 150.0
    cfg.state.plane_msckf_max_cond = 150.0


def _accel_device():
    for plat in ("axon", "tpu", "gpu"):
        try:
            devs = jax.devices(plat)
            if devs:
                return devs[0]
        except RuntimeError:
            continue
    return jax.devices()[0]


def render_frames(cfg, sim, render, n, scene="", dense=False):
    # Disk cache: the textured host render of a 400-500-frame sequence costs
    # 10-25 min on this 4-vCPU box and is fully deterministic in
    # (scene, density, n, resolution) — re-measuring a cell (post-fix
    # validation, dtype discriminators) should not pay it twice.
    cache = ""
    if scene:
        cache = (f"/tmp/mc_frames_{scene}_{'dense' if dense else 'sparse'}"
                 f"_n{n}_w{cfg.cam_wh[0]}x{cfg.cam_wh[1]}.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            # ONE decompression, views into one shared parent. The previous
            # `[z["frames"][i] for i in range(n)]` re-decompressed the whole
            # archive per index (NpzFile.__getitem__ is uncached) AND each
            # basic-index view pinned its own full-array parent — 377 frames
            # × 472 MB ≈ 178 GB, the OOM that killed the round-5 frame-warm.
            fr = z["frames"]
            print(f"[mc] loaded {n} cached frames from {cache}", file=sys.stderr)
            return [fr[i] for i in range(n)]
    _, traj_pos, _ = get_trajectory(cfg.sim)
    planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)
    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    frames = []
    for i in range(1, n + 1):
        R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
        frames.append(render_frame_textured(
            planes.corners, planes.normal, planes.d, feat_p, R_GtoI,
            np.asarray(sim.gt_p[i]), R_ItoC, p_IinC, zeta, cfg.cam_wh, **render))
    if cache:
        np.savez_compressed(cache, frames=np.stack(frames).astype(np.float32))
        print(f"[mc] cached frames -> {cache}", file=sys.stderr)
    return frames


def run_variant(cfg0, sim, frames, B, seed, use_planes, dt, label,
                img_noise=0.01):
    cfg = copy.deepcopy(cfg0)
    cfg.state.use_plane_constraint = use_planes
    cfg.state.use_plane_slam_feats = use_planes
    eng = VioEngine.from_config(cfg)
    drv = FusedVisionDriver(cfg, eng, batch=B)
    fev0 = drv.init_frontend()

    cpu = jax.devices("cpu")[0]
    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=1.0 / cfg.sim.freq_imu,
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    with jax.default_device(cpu):
        sims = [apply_noise(sim, k, noise) for k in keys]
    states = [init_state_with_gt(
        eng, cfg, t0=s.cam_t_imu[0], q0=s.gt_q[0], p0=s.gt_p[0], v0=s.gt_v[0],
        bg0=s.gt_bg_cam[0], ba0=s.gt_ba_cam[0], dtype=dt) for s in sims]
    state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=dt)
    bank = jax.tree.map(lambda x: jnp.stack([x] * B), bank)
    fev = jax.tree.map(lambda x: jnp.stack([x] * B), fev0)
    imu_wb = np.stack([np.asarray(s.imu_w) for s in sims])   # [B, Ti, 3]
    imu_ab = np.stack([np.asarray(s.imu_a) for s in sims])
    imu_t = np.asarray(sim.imu_t)

    n = len(frames)
    W = cfg.tpu.max_imu_per_frame
    H, Wd = cfg.cam_wh[1], cfg.cam_wh[0]
    rng = np.random.default_rng(seed + 999)   # SAME stream for ON and OFF

    def _noisy(i):
        # Per-frame iid per-stream image noise, then the camera ADC (8-bit
        # lattice quantization — keeps the u8 wire exactly lossless).
        x = frames[i - 1][None]
        if img_noise > 0:
            x = x + rng.normal(0.0, img_noise, (B, H, Wd))
        x = np.clip(x, 0.0, 1.0)
        return np.rint(x * np.float32(255.0)).astype(np.float32) * np.float32(1.0 / 255.0)

    img_iter = Prefetcher((_noisy(i) for i in range(1, n + 1)),
                          stage=drv.stage_image, depth=2)
    ps, qs = [], []
    t0 = time.time()
    for i in range(1, n + 1):
        s0 = int(sim.imu_window_start[i])
        it_w = np.full((B, W), np.inf)
        iw_w = np.zeros((B, W, 3))
        ia_w = np.zeros((B, W, 3))
        m = len(imu_t[s0:s0 + W])
        it_w[:, :m] = imu_t[s0:s0 + W][None]
        iw_w[:, :m] = imu_wb[:, s0:s0 + W]
        ia_w[:, :m] = imu_ab[:, s0:s0 + W]
        state, bank, fev, out = drv.step_batch(
            state, bank, fev, next(img_iter), it_w, iw_w, ia_w,
            np.full(B, float(sim.cam_t_imu[i])))
        ps.append(out.p)          # device futures; ONE pull at the end
        qs.append(out.q)
    drv.flush_stream()
    p_all = np.asarray(jnp.stack(ps))   # [n, B, 3]
    q_all = np.asarray(jnp.stack(qs))
    wall = time.time() - t0
    n_constr = int(sum(c[1] for c in drv.last_counters)) if use_planes else 0
    print(f"[mc] {label}: {n} frames x {B} seeds in {wall:.0f}s "
          f"({n * B / wall:.1f} fps agg)", file=sys.stderr)

    gt_p = np.asarray(sim.gt_p[1:n + 1])
    gt_q = np.asarray(sim.gt_q[1:n + 1])
    ates = []
    with jax.default_device(cpu):
        for b in range(B):
            ap, ao, _, _ = ate_posyaw(jnp.asarray(p_all[:, b]), jnp.asarray(q_all[:, b]),
                                      jnp.asarray(gt_p), jnp.asarray(gt_q))
            ates.append((float(ap), float(ao)))
    return ates


def paired_stats(on, off):
    """mean ± std per arm + paired-t 95% CI on the Δ (ON − OFF).

    Divergent seeds (non-finite ATE — a stream that NaN'd or blew up) are
    excluded PAIRWISE and counted: the reference's MC protocol averages the
    runs that completed, and a divergence count is itself a robustness
    result that must be reported, not hidden (see BASELINE.md)."""
    on, off = np.asarray(on), np.asarray(off)
    finite = np.isfinite(on).all(axis=1) & np.isfinite(off).all(axis=1)
    out = {"n_seeds": int(len(on)),
           "n_diverged_on": int((~np.isfinite(on).all(axis=1)).sum()),
           "n_diverged_off": int((~np.isfinite(off).all(axis=1)).sum())}
    on, off = on[finite], off[finite]
    if len(on) == 0:
        return out
    d = on - off
    nb = len(d)
    for j, name in enumerate(["pos_m", "ori_deg"]):
        dj = d[:, j]
        sd = dj.std(ddof=1) if nb > 1 else 0.0
        se = sd / np.sqrt(nb) if nb > 1 else 0.0
        try:
            from scipy.stats import t as _t

            tc = float(_t.ppf(0.975, nb - 1)) if nb > 1 else 0.0
        except ImportError:
            tc = 2.262  # t_{0.975, 9}
        out[name] = {
            "on_mean": float(on[:, j].mean()), "on_std": float(on[:, j].std(ddof=1)),
            "off_mean": float(off[:, j].mean()), "off_std": float(off[:, j].std(ddof=1)),
            "delta_mean": float(dj.mean()),
            "delta_ci95": [float(dj.mean() - tc * se), float(dj.mean() + tc * se)],
            "delta_pct": float(100.0 * dj.mean() / off[:, j].mean()),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True, choices=["tabletop", "room", "corridor", "lowtex"])
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--seed0", type=int, default=17)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--densities", default="dense,sparse")
    ap.add_argument("--img-noise", type=float, default=0.01,
                    help="per-frame per-stream iid image noise sigma ([0,1] "
                         "scale) added before the 8-bit ADC; 0 = clean "
                         "renders (seeds then differ only in IMU noise — "
                         "the round-3 single-seed protocol's noise model)")
    ap.add_argument("--dtype", default="auto", choices=["auto", "f32", "f64"],
                    help="filter dtype override (auto: f32 on accel, f64 on "
                         "CPU) — 'f32' on CPU isolates precision effects "
                         "from device effects")
    ap.add_argument("--out", default="")
    # --- ablation knobs for localizing ON-arm accuracy effects ------------
    ap.add_argument("--no-plane-msckf", action="store_true",
                    help="ON arm: disable the out-of-state grouped plane-"
                         "MSCKF updates (CP-state init + in-state rows only)")
    ap.add_argument("--adaptive-sigma", action="store_true",
                    help="ON arm: noise-adaptive constraint whitening "
                         "(tpu.sigma_c_adaptive)")
    ap.add_argument("--sigma-c", type=float, default=0.0,
                    help="override sigma_constraint (reference real-data "
                         "configs use 0.01 with const_init_multi 1)")
    ap.add_argument("--const-init-multi", type=float, default=0.0)
    ap.add_argument("--msckf-min-feat", type=int, default=0,
                    help="override plane_msckf_min_feat (reference real-data "
                         "configs use 8; the sim default is 5)")
    args = ap.parse_args()

    accel = _accel_device()
    on_accel = accel.platform not in ("cpu",)
    dt = {"auto": jnp.float32 if on_accel else jnp.float64,
          "f32": jnp.float32, "f64": jnp.float64}[args.dtype]
    print(f"[mc] device {accel}, filter dtype {dt.__name__}", file=sys.stderr)

    results = {"scene": args.scene, "seeds": args.seeds,
               "img_noise": args.img_noise, "dtype": args.dtype, "cells": {}}
    for dense in [d.strip() == "dense" for d in args.densities.split(",")]:
        cfg, render = scene_config(args.scene, dense)
        if args.no_plane_msckf:
            cfg.state.use_plane_constraint_msckf = False
        if args.adaptive_sigma:
            cfg.tpu.sigma_c_adaptive = True
        if args.sigma_c > 0:
            cfg.state.sigma_constraint = args.sigma_c
        if args.const_init_multi > 0:
            cfg.state.const_init_multi = args.const_init_multi
        if args.msckf_min_feat > 0:
            cfg.state.plane_msckf_min_feat = args.msckf_min_feat
        t0 = time.time()
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
        n = int(sim.cam_t_imu.shape[0]) - 1
        if args.max_frames:
            n = min(n, args.max_frames)
        frames = render_frames(cfg, sim, render, n, scene=args.scene, dense=dense)
        print(f"[mc] {args.scene}/{'dense' if dense else 'sparse'}: {n} frames "
              f"rendered in {time.time()-t0:.0f}s (untimed)", file=sys.stderr)

        dname = "dense" if dense else "sparse"
        ates = {}
        for use_planes in (True, False):
            label = f"{args.scene}/{dname}/{'ON' if use_planes else 'OFF'}"
            ates[use_planes] = run_variant(cfg, sim, frames, args.seeds,
                                           args.seed0, use_planes, dt, label,
                                           img_noise=args.img_noise)
        stats = paired_stats(ates[True], ates[False])
        results["cells"][dname] = {
            "ate_on": ates[True], "ate_off": ates[False], "stats": stats}
        if stats.get("n_diverged_on") or stats.get("n_diverged_off"):
            print(f"[mc] {args.scene}/{dname}: DIVERGED seeds — "
                  f"ON {stats['n_diverged_on']}/{stats['n_seeds']}, "
                  f"OFF {stats['n_diverged_off']}/{stats['n_seeds']} "
                  f"(stats over the converged pairs)")
        for name, s in stats.items():
            if not isinstance(s, dict):
                continue
            lo, hi = s["delta_ci95"]
            sig = "SIGNIFICANT" if (lo > 0) == (hi > 0) and lo * hi > 0 else "within noise"
            print(f"[mc] {args.scene}/{dname} {name}: ON {s['on_mean']:.4f}"
                  f"±{s['on_std']:.4f} vs OFF {s['off_mean']:.4f}±{s['off_std']:.4f}"
                  f"  Δ {s['delta_mean']:+.4f} ({s['delta_pct']:+.1f}%) "
                  f"CI95 [{lo:+.4f}, {hi:+.4f}] -> {sig}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[mc] wrote {args.out}")


if __name__ == "__main__":
    main()
