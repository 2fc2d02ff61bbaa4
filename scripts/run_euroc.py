"""Serial EuRoC/ASL dataset replay (the ros1_serial_msckf equivalent, minus ROS).

Consumes the standard extracted EuRoC layout:

    <data>/mav0/imu0/data.csv                 t[ns], w(3), a(3)
    <data>/mav0/cam0/data.csv                 t[ns], filename
    <data>/mav0/cam0/data/<filename>.png
    <data>/mav0/state_groundtruth_estimate0/data.csv   (optional, gt init + ATE)

Flow (ros1_serial_msckf.cpp:46-287): sort measurements, initialize (ground
truth if available, else static IMU init), then per camera frame run the
vision pipeline (KLT/FAST/plane detection) and the jitted filter step.
Outputs a TUM trajectory + timing CSV and prints posyaw ATE when gt is given.

Usage:
    python scripts/run_euroc.py --data /path/to/V1_01_easy --max-frames 500
"""

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

from ov_plane_tpu.eval import io as eio
from ov_plane_tpu.eval.metrics import ate_posyaw
from ov_plane_tpu.frontend.pipeline import VisionPipeline
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.initializer import InitOptions, static_initialize
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, step
from ov_plane_tpu.parallel.ingest import Prefetcher
from ov_plane_tpu.utils import printer
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.config import load_yaml, sim_config


def euroc_v1_config():
    """EuRoC MAV cam0/imu0 calibration (kalibr values used by the reference
    config/euroc_mav chain files)."""
    cfg = sim_config()
    cfg.cam_model = "radtan"
    cfg.cam_wh = [752, 480]
    cfg.cam_intrinsics = [458.654, 457.296, 367.215, 248.375,
                          -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
    # T_cam_imu from EuRoC calibration → JPL q_ItoC + p_IinC.
    T_CtoI = np.array([
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ])
    R_ItoC = T_CtoI[:3, :3].T
    p_IinC = -R_ItoC @ T_CtoI[:3, 3]
    from ov_plane_tpu.ops.quat import rot_2_quat

    q = np.asarray(rot_2_quat(jnp.asarray(R_ItoC)))
    cfg.cam_extrinsics = [*q, *p_IinC]
    cfg.imu_noises.sigma_w = 1.6968e-04
    cfg.imu_noises.sigma_wb = 1.9393e-05
    cfg.imu_noises.sigma_a = 2.0e-3
    cfg.imu_noises.sigma_ab = 3.0e-3
    cfg.msckf_options.chi2_multipler = 5.0
    cfg.slam_options.chi2_multipler = 5.0
    cfg.state.max_slam_features = 15
    cfg.gravity_mag = 9.81
    return cfg


def load_image(path):
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), np.float32) / 255.0
    return img


def _save_viz_images(out_dir, frame_no, img, fe):
    """Write the three debug images (eval/trackviz) for this frame."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ov_plane_tpu.eval import trackviz

    os.makedirs(out_dir, exist_ok=True)
    f2p = dict(fe.plane_tracker.feat_to_plane)
    viz = fe.plane_tracker.last_viz
    images = {
        "active": trackviz.draw_active(img, fe.ids, fe.uv, fe.valid, f2p),
        "history": trackviz.draw_history(img, fe.hist_uv, fe.hist_valid, fe.ids, f2p),
        "delaunay": trackviz.draw_delaunay_normals(
            img, viz.get("uv", {}), viz.get("tris", []), viz.get("norms", [])),
    }
    for name, rgb in images.items():
        plt.imsave(os.path.join(out_dir, f"{name}_{frame_no:05d}.png"), rgb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="", help="sequence dir containing mav0/")
    ap.add_argument("--bag", default="", help="replay directly from a ROS1 .bag "
                    "(ros1_serial_msckf.cpp:132-190 semantics; no conversion step)")
    ap.add_argument("--imu-topic", default="/imu0")
    ap.add_argument("--cam-topic", default="/cam0/image_raw",
                    help="camera topic; comma-separated list enables stereo "
                         "timestamp pairing (cam0 of each synced pair is fed)")
    ap.add_argument("--gt", default="", help="optional ASL gt csv (for --bag replays "
                    "whose gt ships outside the bag, e.g. AR-Table)")
    ap.add_argument("--config", default=None, help="estimator_config.yaml (reference format)")
    ap.add_argument("--out", default="/tmp/ovp_euroc_traj.txt")
    ap.add_argument("--timing", default="/tmp/ovp_euroc_timing.csv")
    ap.add_argument("--plane-csv", default="/tmp/ovp_plane_track.csv",
                    help="plane-tracking statistics CSV (reference second CSV)")
    ap.add_argument("--odom-out", default="",
                    help="also write IMU-rate odometry (fast_state_propagate "
                         "between updates, ROS1Visualizer.cpp:414-424) to this TUM file")
    ap.add_argument("--ckpt", default="",
                    help="checkpoint npz path; with --ckpt-every N, filter "
                         "state+bank+trajectory are saved every N frames")
    ap.add_argument("--ckpt-every", type=int, default=200)
    ap.add_argument("--resume", action="store_true",
                    help="resume the replay from --ckpt (filter state continues; "
                         "the vision tracker re-bootstraps, so expect a few "
                         "tracking-warmup frames)")
    ap.add_argument("--loop-out", default="",
                    help="write per-frame loop-closure info packs (pose, active "
                         "tracks, sparse depth — the reference's pub_loop_* "
                         "surface) into this directory")
    ap.add_argument("--loop-every", type=int, default=10)
    ap.add_argument("--verbosity", default="",
                    help="override console verbosity (ALL/DEBUG/INFO/WARNING/"
                         "ERROR/SILENT; default comes from the config YAML)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--use-planes", action="store_true")
    ap.add_argument("--max-slam", type=int, default=-1,
                    help="override state.max_slam_features (the protocol "
                         "scripts' num_slam knob, results/run_ros_eth.sh:49-52); "
                         "-1 keeps the config value")
    ap.add_argument("--map-capacity", type=int, default=8192,
                    help="persistent device plane-map point capacity (--use-planes)")
    ap.add_argument("--map-voxel", type=float, default=0.10,
                    help="persistent-map downsample voxel (m)")
    ap.add_argument("--map-out", default="",
                    help="write the final persistent-map cloud (npz: points, plane_id)")
    ap.add_argument("--downsample", type=int, default=1, help="process every Nth frame")
    ap.add_argument("--no-gt-init", action="store_true",
                    help="ignore groundtruth for initialization (still used for ATE)")
    ap.add_argument("--viz-dir", default="",
                    help="save tracking/plane debug images (active, history, "
                         "delaunay) here every 25 frames")
    ap.add_argument("--sim-calib", action="store_true",
                    help="use the simulator's camera calibration (for ASL folders "
                         "exported by scripts/make_synth_asl.py) and disable "
                         "histogram preprocessing (synthetic frames are clean)")
    ap.add_argument("--fast-threshold", type=float, default=0.0,
                    help="override the FAST detector threshold (0-255 scale); "
                         "a dataset-level knob the reference also varies per "
                         "dataset (sim 15, euroc 30)")
    ap.add_argument("--stock-plane-gates", action="store_true",
                    help="with --sim-calib --use-planes: keep the reference's "
                         "DEFAULT plane gates (cond<=50, min_norms, averaging "
                         "variance) instead of the synthetic-room protocol "
                         "overrides — the second-scene validation mode")
    ap.add_argument("--track-cap", type=int, default=0,
                    help="override the tracker capacity (num_pts). Low caps "
                         "(e.g. 40) emulate texture-poor scenes — the regime "
                         "where plane constraints carry the filter")
    ap.add_argument("--f32", action="store_true",
                    help="run the filter in float32 (the TPU dtype — f64 "
                         "matmuls are emulated on-chip; f32+highest is "
                         "validated ≡ f64 on the sim workload, BASELINE.md)")
    ap.add_argument("--fused", action="store_true",
                    help="run the replay through the fused one-dispatch vision "
                         "step (frontend/fused.py): the whole frontend + filter "
                         "frame is ONE device program — the TPU deployment path "
                         "(the unfused pipeline pays ~25 dispatch round trips "
                         "per frame through the remote tunnel). Images ship on "
                         "the uint8 wire (PNG/bag sources are 8-bit, lossless). "
                         "--viz-dir is unavailable in this mode (the per-frame "
                         "track history stays on device)")
    args = ap.parse_args()

    cfg = euroc_v1_config()
    if args.sim_calib:
        sc = sim_config()
        cfg.cam_model = sc.cam_model
        cfg.cam_wh = sc.cam_wh
        cfg.cam_intrinsics = sc.cam_intrinsics
        cfg.cam_extrinsics = sc.cam_extrinsics
        cfg.histogram_method = "NONE"
        # Tracker capacity must not exceed the filter's per-frame observation
        # budget: with more live tracks than obs slots, the emit stage feeds
        # only the oldest slots — exactly the tracks with the most
        # accumulated template drift — and the filter inherits their bias.
        cfg.num_pts = 150
        cfg.num_pts_plane = 0
        cfg.tpu.max_obs_per_frame = 160
        # Frontend noise on the synthetic renderer is ~1.5-2 px (vs ~0.5 px
        # for OpenCV KLT on real texture); whiten accordingly.
        cfg.msckf_options.sigma_pix = 2.0
        cfg.slam_options.sigma_pix = 2.0
        # --stock-plane-gates (second-scene validation, VERDICT round-2
        # weak #5): every plane gate stays at the reference default
        # (cond<=50, min_feat 10, min_norms 5, avg 20/20); only the
        # renderer-noise whitening above (a calibration fact) is applied.
        if args.use_planes and not args.stock_plane_gates:
            # Plane-clustering gates tuned for the synthetic close-range
            # room (same values the image-driven plane e2e validates): the
            # triangulated-normal noise at this feature density needs the
            # looser averaging gates, and support builds to ~10-40 co-planar
            # features so the reference's init threshold is reachable.
            cfg.state.plane_init_min_feat = 8
            cfg.trackplane.min_norms = 3
            cfg.trackplane.max_norm_avg_var = 30.0
            cfg.trackplane.max_norm_avg_max = 30.0
            cfg.msckf_options.chi2_multipler = 5.0
            # The plane-fit condition gate acts on RAW global coordinates
            # (PlaneFitting.cpp:59-66), so it scales with |scene origin
            # offset| / cluster spread: the reference's 50 suits its
            # table-origin AR scenes, while this room-scan orbits 1-2 m from
            # the world origin and healthy 15-feature wall clusters measure
            # cond 40-260 (nowhere near numerically singular for the 3x3
            # solve). Gate at 150 for the synthetic protocol; the default
            # stays at the reference's 50.
            cfg.state.plane_init_max_cond = 150.0
            cfg.state.plane_msckf_max_cond = 150.0
    if args.config:
        cfg = load_yaml(args.config, base=cfg)
    if args.fast_threshold > 0:
        cfg.fast_threshold = args.fast_threshold
    if args.track_cap > 0:
        cfg.num_pts = args.track_cap
        cfg.tpu.max_obs_per_frame = max(2 * args.track_cap, 32)
    cfg.state.use_plane_constraint = args.use_planes
    cfg.state.use_plane_slam_feats = args.use_planes
    if args.max_slam >= 0:
        cfg.state.max_slam_features = args.max_slam
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    # Verbosity: CLI override wins, else the config's key (the loader itself
    # is side-effect-free); DEBUG also dumps the print-on-load config audit.
    printer.set_print_level(args.verbosity or cfg.verbosity)
    printer.print_config(cfg)
    dt = jnp.float32 if args.f32 else jnp.float64

    if args.bag:
        # Direct bag replay (the reference's serial driver indexes the bag and
        # drains messages in stamp order, ros1_serial_msckf.cpp:132-280; the
        # pure-python reader does the same indexing + stamp sort). A
        # comma-separated --cam-topic list enables the serial driver's STEREO
        # ingestion (timestamp pairing, unpaired frames skipped,
        # ros1_serial_msckf.cpp:196-254); the estimator stays monocular — the
        # reference's TrackPlane hard-exits on >1 camera (TrackPlane.cpp:85-91)
        # — so cam0 of each synced pair is fed.
        from ov_plane_tpu.eval.rosbag import read_bag, read_bag_stereo

        cam_topics = [t.strip() for t in args.cam_topic.split(",") if t.strip()]
        if len(cam_topics) > 1:
            imu_t, imu_w, imu_a, cam_t, imgs_by_cam, n_unpaired = read_bag_stereo(
                args.bag, args.imu_topic, cam_topics)
            bag_imgs = imgs_by_cam[0]
            print(f"[euroc] stereo pairing: {len(cam_t)} synced pairs across "
                  f"{len(cam_topics)} cameras, {n_unpaired} unpaired frames skipped")
        else:
            imu_t, imu_w, imu_a, cam_t, bag_imgs = read_bag(
                args.bag, args.imu_topic, cam_topics[0])
        bag_imgs = [np.asarray(im, np.float32) / 255.0 if im.dtype == np.uint8
                    else np.asarray(im, np.float32) for im in bag_imgs]

        def get_frame(i):
            return bag_imgs[i]

        gt_path = args.gt
        have_gt = bool(args.gt) and os.path.exists(args.gt)
    else:
        if not args.data:
            ap.error("one of --data or --bag is required")
        mav0 = os.path.join(args.data, "mav0")
        imu = np.loadtxt(os.path.join(mav0, "imu0", "data.csv"), delimiter=",", comments="#")
        imu_t = imu[:, 0] * 1e-9
        imu_w = imu[:, 1:4]
        imu_a = imu[:, 4:7]
        cam_csv = np.genfromtxt(os.path.join(mav0, "cam0", "data.csv"), delimiter=",",
                                comments="#", dtype=str)
        cam_t = cam_csv[:, 0].astype(np.float64) * 1e-9
        cam_files = [os.path.join(mav0, "cam0", "data", f.strip()) for f in cam_csv[:, 1]]

        def get_frame(i):
            return load_image(cam_files[i])

        gt_path = args.gt or os.path.join(mav0, "state_groundtruth_estimate0", "data.csv")
        have_gt = os.path.exists(gt_path)

    eng = VioEngine.from_config(cfg)
    pipe = VisionPipeline(cfg, eng)
    fdrv = fev = None
    if args.fused:
        if args.viz_dir:
            ap.error("--viz-dir needs the host tracker (drop --fused)")
        from ov_plane_tpu.frontend.fused import FusedVisionDriver

        # PNG/bag frames are 8-bit at the source: the u8 wire is lossless.
        os.environ.setdefault("OVP_IMG_WIRE", "u8")
        fdrv = FusedVisionDriver(cfg, eng)
        fev = fdrv.init_frontend()
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=dt)
    rec = eio.TimingRecorder()
    prec = eio.PlaneStatsRecorder()
    # Persistent device plane map (config 4; ROS1Visualizer.cpp:1413-1520):
    # maintained in-loop from the frontend's triangulated on-plane points.
    pmap = None
    if args.use_planes:
        from ov_plane_tpu.frontend.map_blocks import PersistentPlaneMap

        pmap = PersistentPlaneMap(capacity=args.map_capacity, voxel=args.map_voxel,
                                  frame_batch=fdrv.vopts.cap if fdrv else pipe.fe.cap)

    # ----- initialization --------------------------------------------------
    state = None
    start_idx = 0
    if have_gt and not args.no_gt_init:
        t_gt, p_gt, q_gt, v_gt, bg_gt, ba_gt = eio.read_euroc_gt(gt_path)
        # Initialize at the first camera frame with gt available.
        for i, t in enumerate(cam_t):
            j = np.searchsorted(t_gt, t)
            if 0 < j < len(t_gt):
                state = init_state_with_gt(
                    eng, cfg, t0=t, q0=q_gt[j], p0=p_gt[j], v0=v_gt[j],
                    bg0=bg_gt[j], ba0=ba_gt[j], dtype=dt,
                )
                start_idx = i + 1
                break
    if state is None:
        # Static initialization from the IMU stream.
        opts = InitOptions(window_time=cfg.sim.freq_cam and 1.0 or 1.0,
                           imu_thresh=1.0, gravity_mag=cfg.gravity_mag)
        for i, t in enumerate(cam_t):
            lo = np.searchsorted(imu_t, t - 2.5)
            hi = np.searchsorted(imu_t, t)
            if hi - lo < 100:
                continue
            ok, t0, imu16, cov_diag = static_initialize(
                jnp.asarray(imu_t[lo:hi]), jnp.asarray(imu_w[lo:hi]), jnp.asarray(imu_a[lo:hi]),
                t, opts,
            )
            if bool(ok):
                state = init_state_with_gt(
                    eng, cfg, t0=t, q0=imu16[0:4], p0=imu16[4:7], v0=imu16[7:10],
                    bg0=imu16[10:13], ba0=imu16[13:16], dtype=dt,
                )
                start_idx = i + 1
                print(f"[euroc] static init at t={t:.3f}")
                break
    if state is None:
        # Dynamic initialization: the platform starts in motion. Track
        # features over a 2 s window and solve the linear system.
        from ov_plane_tpu.models.dyn_init import (
            DynInitOptions,
            dynamic_initialize,
            dynamic_mle_refine,
        )
        from ov_plane_tpu.ops import cams as _cams
        from ov_plane_tpu.ops.quat import quat_2_rot as _q2r

        print("[euroc] static init failed; trying dynamic init", file=sys.stderr)
        win = {}
        zeta = jnp.asarray(cfg.cam_intrinsics)
        R_ItoC = _q2r(jnp.asarray(cfg.cam_extrinsics[0:4]))
        for i, t in enumerate(cam_t):
            img = get_frame(i)
            obs = pipe.process_image(img, state if state is not None else init_state_with_gt(
                eng, cfg, t0=t, q0=jnp.asarray([0.0, 0, 0, 1]), p0=jnp.zeros(3), v0=jnp.zeros(3),
                bg0=jnp.zeros(3), ba0=jnp.zeros(3)), bank)
            oid, ouv, _ = obs
            win[i] = (t, np.asarray(oid), np.asarray(ouv))
            keys = sorted(win)
            # Drop outside 2.2 s.
            while win and win[keys[0]][0] < t - 2.2:
                win.pop(keys[0]); keys = sorted(win)
            if len(win) < 12 or (t - win[keys[0]][0]) < 1.8:
                continue
            # 6 poses evenly spread.
            sel = [keys[int(r)] for r in np.linspace(0, len(keys) - 1, 6)]
            tp = np.asarray([win[s_][0] for s_ in sel])
            common = set(win[sel[0]][1][win[sel[0]][1] >= 0])
            for s_ in sel[1:]:
                common &= set(win[s_][1][win[s_][1] >= 0])
            common = sorted(common)[:16]
            if len(common) < 8:
                continue
            F = len(common)
            uvn = np.zeros((6, F, 2)); mk = np.zeros((6, F), bool)
            for a, s_ in enumerate(sel):
                tt, oid, ouv = win[s_]
                for fi, fid in enumerate(common):
                    j = np.nonzero(oid == fid)[0]
                    if len(j):
                        uvn[a, fi] = np.asarray(_cams.undistort(jnp.asarray(ouv[j[0]]), zeta, eng.cam_model))
                        mk[a, fi] = True
            lo2 = np.searchsorted(imu_t, tp[0]) - 2
            hi2 = np.searchsorted(imu_t, tp[-1]) + 3
            di_opts = DynInitOptions(min_deg=5.0)
            di_args = (
                jnp.asarray(imu_t[lo2:hi2]), jnp.asarray(imu_w[lo2:hi2]), jnp.asarray(imu_a[lo2:hi2]),
                jnp.asarray(tp), jnp.asarray(uvn), jnp.asarray(mk),
                R_ItoC, jnp.asarray(cfg.cam_extrinsics[4:7]),
            )
            ok, q0_, v0_, g_err, pf_, fok_ = dynamic_initialize(*di_args, di_opts)
            if not bool(ok):
                print(f"[euroc] dyn-init attempt t={t:.2f}: F={F} "
                      f"g_err={float(g_err):.2f} -> rejected", file=sys.stderr)
            bg0_, ba0_ = jnp.zeros(3), jnp.zeros(3)
            if bool(ok) and di_opts.mle_iters > 0:
                # MLE refinement over the window (biases + gravity + feats).
                R_lin = _q2r(q0_)
                ok_m, q_m, v_m, bg_m, ba_m, _, gerr_m, _ = dynamic_mle_refine(
                    *di_args, R_lin @ v0_,
                    R_lin @ jnp.asarray([0.0, 0.0, di_opts.gravity_mag]),
                    jnp.einsum("ij,fj->fi", R_lin, pf_), fok_, di_opts)
                if bool(ok_m):
                    q0_, v0_, bg0_, ba0_, g_err = q_m, v_m, bg_m, ba_m, gerr_m
                    print(f"[euroc] dynamic MLE refined (|g| err {float(gerr_m):.3f}, "
                          f"bg {np.asarray(bg_m).round(4)}, ba {np.asarray(ba_m).round(3)})")
            if bool(ok):
                state = init_state_with_gt(eng, cfg, t0=t, q0=q0_, p0=jnp.zeros(3), v0=v0_,
                                           bg0=bg0_, ba0=ba0_, dtype=dt)
                # Dynamic init is NOT gt-grade: inflate the seed covariance
                # (the reference's init_dyn_inflation_* on the MLE posterior;
                # ov_init DynamicInitializer orientation/velocity/bias terms).
                infl = np.ones(15)
                infl[0:3] = di_opts.inflation_ori
                infl[6:9] = di_opts.inflation_vel
                infl[9:12] = di_opts.inflation_bg
                infl[12:15] = di_opts.inflation_ba
                s_ = jnp.asarray(np.sqrt(infl))
                cov15 = state.cov[:15, :15] * s_[:, None] * s_[None, :]
                state = state.replace(cov=state.cov.at[:15, :15].set(cov15))
                start_idx = i + 1
                # Reset the tracking state for the filtered run.
                pipe.fe.prev_pyr = None
                bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones,
                                          dtype=dt)
                print(f"[euroc] dynamic init at t={t:.3f} (|g| err {float(g_err):.2f})")
                break
    if state is None:
        print("[euroc] initialization failed", file=sys.stderr)
        sys.exit(1)

    # ----- replay ----------------------------------------------------------
    import time

    times, poss, quats = [], [], []
    n_done = 0
    W = cfg.tpu.max_imu_per_frame
    if args.ckpt and args.resume:
        # Crash-resume (new architecture; the reference has no checkpointing,
        # SURVEY §5.4): restore filter state + feature bank + recorded
        # trajectory and continue at the saved frame index.
        from ov_plane_tpu.utils.checkpoint import load_npz

        state, bank = load_npz(args.ckpt, state, bank)
        meta = np.load(args.ckpt + ".meta.npz")
        start_idx = int(meta["next_frame"])
        times = list(meta["times"])
        poss = list(meta["poss"])
        quats = list(meta["quats"])
        # Restore recorder rows so the timing / plane-stats CSVs cover the
        # full run, not just post-resume frames (their write() truncates).
        if "timing_rows" in meta:
            rec.rows = [list(r) for r in meta["timing_rows"]]
        if "plane_rows" in meta:
            prec.rows = [list(r) for r in meta["plane_rows"]]
        pipe.fe.prev_pyr = None  # tracker re-bootstraps
        # Reissued frontend ids must not collide with feature ids still alive
        # in the restored bank/SLAM state (fb.ingest matches by id — a clash
        # would append a new feature's pixels to an old landmark's history).
        pipe.fe.next_id = (int(meta["next_id"]) if "next_id" in meta
                           else int(np.asarray(bank.fid).max()) + 1_000_000)
        if fdrv is not None:
            fev = fdrv.init_frontend(first_id=pipe.fe.next_id)
        print(f"[euroc] resumed from {args.ckpt} at frame index {start_idx} "
              f"({len(times)} frames already recorded)")
    # Host-ingest pipeline: decode frames 2 ahead on a background thread so
    # disk/JPEG work overlaps the filter step (SURVEY §2.4 item 4; the
    # reference's camera-queue + update-thread analogue).
    frame_idxs = range(start_idx, len(cam_t), args.downsample)
    if fdrv is not None:
        # Fused path: also pack the frame to its wire dtype and start the
        # host→device upload on the background thread (fdrv.stage_image) —
        # the image is the wire-dominant input, so its transfer overlaps the
        # previous frame's device step instead of serializing with it.
        _stage = lambda i: (i, fdrv.stage_image(get_frame(i)))
    else:
        _stage = lambda i: (i, get_frame(i))
    frames_it = Prefetcher(frame_idxs, stage=_stage, depth=2)
    odom_rows = []  # (t, imu16) at IMU rate between updates
    if args.odom_out:
        from ov_plane_tpu.state.propagator import fast_state_propagate

        _noises = jnp.asarray([eng.sigma_w2, eng.sigma_a2, eng.sigma_wb2, eng.sigma_ab2])
        _gravity = jnp.asarray([0.0, 0.0, eng.gravity_mag])

        @jax.jit
        def _fsp(st, ts, ws, accs, tgts):
            one = lambda tt: fast_state_propagate(st, ts, ws, accs, tt,
                                                  _noises, _gravity, eng.prop_opts)
            return jax.vmap(one)(tgts)
    for i, img in frames_it:
        if args.max_frames and n_done >= args.max_frames:
            break
        t = float(cam_t[i])
        lo = max(np.searchsorted(imu_t, float(state.t)) - 9, 0)
        seg = slice(lo, min(lo + W, len(imu_t)))
        if args.odom_out and n_done > 0:
            # IMU-rate odometry between the last update and this frame: one
            # vmapped fast_state_propagate over the pending IMU stamps (the
            # batched form of the per-message odometry callback).
            # Only stamps the propagation window actually covers (beyond the
            # seg the propagator clips and the stamp would lie).
            span = imu_t[(imu_t > float(state.t)) & (imu_t <= min(t, imu_t[seg][-1]))]
            # Chunked to a fixed vmap width so one compiled program serves any
            # gap length (--downsample widens gaps beyond any single batch).
            B = 16
            for c0 in range(0, len(span), B):
                chunk = span[c0:c0 + B]
                tgt = np.full(B, chunk[-1])
                tgt[: len(chunk)] = chunk
                imu16_b, _ = _fsp(state, jnp.asarray(imu_t[seg]), jnp.asarray(imu_w[seg]),
                                  jnp.asarray(imu_a[seg]), jnp.asarray(tgt))
                for k in range(len(chunk)):
                    odom_rows.append((float(chunk[k]), np.asarray(imu16_b[k])))
        t0 = time.perf_counter()
        if fdrv is not None:
            # One-dispatch fused step: build the fixed-width IMU window, run
            # the device program, and read the pose in a single pull (every
            # device->host transfer is a tunnel round trip). Plane stats,
            # the track table, and counters ride the driver's packed pull
            # (one frame of pipeline lag — the driver overlaps it with the
            # next dispatch).
            it_w = np.full(W, np.inf)
            iw_w = np.zeros((W, 3))
            ia_w = np.zeros((W, 3))
            m = imu_t[seg].shape[0]
            it_w[:m], iw_w[:m], ia_w[:m] = imu_t[seg], imu_w[seg], imu_a[seg]
            state, bank, fev, out = fdrv.step_stream(
                state, bank, fev, img, it_w, iw_w, ia_w, t)
            pq = np.asarray(jnp.concatenate([out.p, out.q.astype(out.p.dtype)]))
            p_np, q_np = pq[0:3], pq[3:7]
            t1 = t0 + fdrv.last_times.get("device", 0.0)
            t2 = time.perf_counter()
            cnt = fdrv.last_counters[0]
            pstats = dict(fdrv.last_plane_stats[0])
            pstats["state planes"] = float(cnt[2])
            pstats["num constraint updates"] = float(cnt[1])
            if cnt.shape[0] > 8:
                pstats["dropped plane updates"] = float(cnt[8])
            last_tri = fdrv.last_tri[0]
            f2p_map = fdrv.trackers[0].feat_to_plane
            n_bank_i, n_slam_i, n_planes_i = int(cnt[4]), -1, int(cnt[2])
        else:
            obs = pipe.process_image(img, state, bank, imu_t=imu_t[seg],
                                     imu_w=imu_w[seg], t_new=t)
            t1 = time.perf_counter()
            frame = pipe.make_frame(obs, imu_t[seg], imu_w[seg], imu_a[seg], t)
            state, bank, out = step(eng, state, bank, frame)
            jax.block_until_ready(out.p)
            t2 = time.perf_counter()
            p_np, q_np = np.asarray(out.p), np.asarray(out.q)
            pstats = dict(pipe.last_plane_stats)
            pstats["state planes"] = float(out.n_planes)
            if out.n_plane_constraints is not None:
                pstats["num constraint updates"] = float(out.n_plane_constraints)
            if out.n_plane_dropped is not None:
                pstats["dropped plane updates"] = float(out.n_plane_dropped)
            last_tri = pipe.last_tri
            f2p_map = pipe.fe.plane_tracker.feat_to_plane
            n_bank_i, n_slam_i, n_planes_i = (int(out.n_bank), int(out.n_slam),
                                              int(out.n_planes))
        rec.add(t, {"tracking": t1 - t0, "total": t2 - t0})
        if pmap is not None and last_tri is not None:
            lids_m, _, lp3_m, lok_m = last_tri
            pmap.add_frame(lids_m, lp3_m, lok_m, f2p_map)
        prec.add(t, pstats)
        times.append(t)
        poss.append(p_np)
        quats.append(q_np)
        n_done += 1
        # Packs are numbered by the dataset frame index (stable across
        # --resume; n_done restarts at 0 there and would overwrite).
        if args.loop_out and n_done % args.loop_every == 0 and last_tri is not None:
            from ov_plane_tpu.eval.loopclosure import loop_pack, save_pack
            from ov_plane_tpu.models.jacobians import clone_set_from_state as _csfs
            from ov_plane_tpu.ops.quat import quat_2_rot as _q2r2

            cl2 = _csfs(state)
            newest2 = int(np.asarray(state.newest_clone_slot))
            lids, luv, lp3, lok = last_tri
            pack = loop_pack(
                t, q_np, p_np,
                np.asarray(cl2.R_GtoC[newest2]), np.asarray(cl2.p_CinG[newest2]),
                np.asarray(state.calib_cam), np.asarray(state.cam_zeta),
                lids, luv, lp3, lok, cfg.cam_wh,
            )
            save_pack(args.loop_out, i, pack)
        # Per-frame state print at DEBUG verbosity (VioManager.cpp:956-985).
        # (calib_dt only on the host path — reading it under --fused would
        # cost a device pull per frame.)
        dt_s = f"dt={float(state.calib_dt):+.5f} " if fdrv is None else ""
        printer.print_debug(
            f"state t={t:.3f} q={q_np.round(4)} p={p_np.round(3)} "
            f"{dt_s}bank={n_bank_i} slam={n_slam_i} planes={n_planes_i}"
        )
        if args.ckpt and n_done % args.ckpt_every == 0:
            from ov_plane_tpu.utils.checkpoint import save_npz

            save_npz(args.ckpt, state, bank)
            np.savez(args.ckpt + ".meta.npz",
                     next_frame=i + args.downsample,
                     next_id=(int(fev.next_id) if fdrv is not None
                              else pipe.fe.next_id),
                     times=np.asarray(times),
                     poss=np.asarray(poss), quats=np.asarray(quats),
                     # Recorder rows too, so post-resume CSVs cover the same
                     # frame range as the trajectory (write() opens in 'w').
                     timing_rows=np.asarray(rec.rows, dtype=float),
                     plane_rows=np.asarray(prec.rows, dtype=float))
            print(f"[euroc] checkpoint at frame {n_done} -> {args.ckpt}")
        if args.viz_dir and n_done % 25 == 0:
            _save_viz_images(args.viz_dir, n_done, img, pipe.fe)
        if n_done % 50 == 0:
            mstat = f", map={pmap.stats()['n_points']}pts" if pmap is not None else ""
            print(f"[euroc] {n_done} frames, t={t:.2f}, p={p_np.round(3)}, "
                  f"bank={n_bank_i}, slam={n_slam_i}, planes={n_planes_i}{mstat}")

    frames_it.close()  # early --max-frames break leaves the producer parked otherwise
    if fdrv is not None:
        fdrv.flush_stream()  # drain the pipelined pull (final frame's stats)
    eio.write_tum(args.out, np.asarray(times), np.asarray(poss), np.asarray(quats))
    rec.write(args.timing)
    if args.plane_csv:
        prec.write(args.plane_csv)
    if args.odom_out and odom_rows:
        ot = np.asarray([r[0] for r in odom_rows])
        o16 = np.stack([r[1] for r in odom_rows])
        eio.write_tum(args.odom_out, ot, o16[:, 4:7], o16[:, 0:4])
        print(f"[euroc] wrote IMU-rate odometry {args.odom_out} ({len(ot)} poses)")
    print(f"[euroc] wrote {args.out} ({n_done} frames)")
    n_dropped_total = int(sum(r[12] for r in prec.rows if len(r) > 12))
    if n_dropped_total:
        print(f"[euroc] WARNING: {n_dropped_total} qualifying plane groups exceeded "
              f"tpu.max_planes_per_frame and were dropped (raise the cap for parity)")
    if pmap is not None:
        st = pmap.stats()
        print(f"[euroc] persistent map: {st['n_points']} pts / {st['n_planes']} planes "
              f"({st['n_inserted_total']} inserted, voxel {args.map_voxel} m)")
        if args.map_out:
            pts_m, pid_m = pmap.cloud()
            # Final-cloud consolidation through the native voxel grid
            # (ikd_grid.cpp) — the host-side twin of the device map's
            # downsample-on-insert, matching the ikd-tree's
            # Add_Points(downsample=true) the reference's map dump reflects
            # (ikd_tree.h:240-261). The device map already downsampled per
            # insert epoch; this pass deduplicates across epochs.
            from ov_plane_tpu.native import VoxelPointMap

            grid = VoxelPointMap(voxel=max(4 * args.map_voxel, 0.2),
                                 downsample=args.map_voxel)
            grid.add(pts_m, pid_m.astype(np.int32), downsample=True)
            pts_d, pid_d = grid.flatten(max_n=max(len(pts_m), 1))
            np.savez(args.map_out, points=pts_d, plane_id=pid_d,
                     points_raw=pts_m, plane_id_raw=pid_m)
            print(f"[euroc] wrote map cloud {args.map_out} "
                  f"({len(pts_d)} pts, {len(pts_m)} pre-consolidation)")

    if have_gt and n_done > 10:
        t_gt, p_gt, q_gt, *_ = eio.read_euroc_gt(gt_path)
        gi = np.clip(np.searchsorted(t_gt, np.asarray(times)), 0, len(t_gt) - 1)
        ate_p, ate_o, _, _ = ate_posyaw(
            jnp.asarray(np.asarray(poss)), jnp.asarray(np.asarray(quats)),
            jnp.asarray(p_gt[gi]), jnp.asarray(q_gt[gi]),
        )
        print(f"[euroc] ATE posyaw: {float(ate_p):.3f} m / {float(ate_o):.3f} deg")


if __name__ == "__main__":
    main()
