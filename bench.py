"""Benchmark: VIO throughput on the available accelerator.

Default mode (BENCH_MODE=vision) is the reference's own headline workload —
the FULL vision pipeline on imagery: KLT tracking, FAST detection, Delaunay
plane detection, CP plane init, point-on-plane constraints, and the EKF step,
run as B independent camera streams on one chip via the fused one-dispatch
program (frontend/fused.py). ``vs_baseline`` divides by the 20 fps EuRoC
camera rate — the reference's real-time bar (ReadMe.md:8 claims real-time
operation; VioManager.cpp:879-928 times exactly this loop).

BENCH_MODE=sim runs the config-1 milestone instead (point-only MSCKF on the
TrackSIM-equivalent path, batch-64 Monte-Carlo). Its ``vs_baseline`` divides
by a MEASURED single-thread CPU stand-in of the reference's per-frame filter
workload (scripts/ground_baseline.py + native/refbench.cpp, ~1700 fps) — an
honest denominator under which a wide accelerator loses the tiny-EKF latency
race (BASELINE.md "honest reckoning"); the sim path's value is batch
replay/serving capacity, reported in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

# Make the CPU backend available next to the accelerator: the sim builder
# runs many small eager host ops that would otherwise each round-trip the
# axon remote-compile server (minutes). The filter replay is explicitly
# placed on the accelerator below.
# Pallas (Mosaic) kernels lower through the axon remote-AOT path since the
# index maps were pinned to i32 (round 2) and run inside this program.
# Measured A/B on the v5e (batch 64): Pallas gram+downdate 507.5 fps vs
# XLA 511.7 fps — statistically tied (~1% run variance); set
# OVP_DISABLE_PALLAS=1 to select the plain-XLA reduction.
os.environ.setdefault("OVP_DISABLE_PALLAS", "0")

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax

jax.config.update("jax_enable_x64", True)
# TPU matmuls default to bf16 operands (8 mantissa bits) — fatal for EKF
# covariance math. Force true-f32 matmul passes ("highest"); BENCH_MATMUL=high
# selects the bf16x3 compromise for throughput experiments (accuracy is
# printed — judge it against the f32 numbers before trusting it).
jax.config.update("jax_default_matmul_precision",
                  os.environ.get("BENCH_MATMUL", "highest"))
# Persistent cache: the big scan graph costs ~5 min to (remote-)compile; the
# cache makes repeat bench runs start in seconds. (cpu_aot_loader may warn
# about host-feature mismatch for CPU entries produced by the remote compile
# terminal; numerically validated runs have been fine.)
from ov_plane_tpu.utils.jaxenv import cache_dir_for
jax.config.update("jax_compilation_cache_dir", cache_dir_for("bench"))

import jax.numpy as jnp
import numpy as np


def _accel_device():
    for plat in ("axon", "tpu", "gpu"):
        try:
            devs = jax.devices(plat)
            if devs:
                return devs[0]
        except RuntimeError:
            continue
    return jax.devices()[0]

# Grounded round 3 (VERDICT item 8): the reference binary cannot be built
# here (ROS + Ceres absent), so scripts/ground_baseline.py + refbench.cpp
# measure an Eigen -O3 single-thread implementation of the reference's
# per-frame filter workload (incl. FeatureDatabase bookkeeping) at THIS
# bench's exact sizes and the workload's MEASURED feature load (p90 = 10
# MSCKF features/frame) on this host: ~1700 fps. Rounds 1-2 divided by a
# "100 fps working estimate" that was wrong by an order of magnitude — a
# D=93/6-feature EKF lives in a CPU core's L1; see BASELINE.md round-3
# "honest reckoning" for the full analysis and where the TPU actually wins
# (vision path, batch serving — not tiny-EKF latency).
REFERENCE_CPU_FPS = float(os.environ.get("BENCH_REF_FPS", "1700"))
# MC instances vmapped on the chip. 64 is the validated sweet spot on one
# v5e: batch 128 of the genuinely-batched program (post per-member noise)
# faults the remote device ("TPU device error"), 64 runs clean.
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
# lax.scan unroll factor for the frame loop (compile time vs dispatch overhead).
UNROLL = int(os.environ.get("BENCH_UNROLL", "1"))


def main_vision():
    """BENCH_MODE=vision: full vision-path throughput — KLT+FAST tracking,
    Delaunay plane detection, and the filter step on rendered frames (the
    reference's real-time claim covers tracking: VioManager.cpp:879-928).

    Frames are pre-rendered on the host (render cost excluded — it stands in
    for the camera); the timed loop is process_image + step, i.e. everything
    the reference times in its per-frame CSV. Reports steady-state frames/s
    and the per-stage breakdown; vs_baseline is against the 20 fps EuRoC
    camera rate (the reference's "real-time" bar on CPU).
    """
    from ov_plane_tpu.frontend.pipeline import VisionPipeline
    from ov_plane_tpu.frontend.synthetic import render_frame_textured
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, step
    from ov_plane_tpu.ops.quat import quat_2_rot
    from ov_plane_tpu.sim.simulator import build_sim, generate_planes
    from ov_plane_tpu.sim.trajectory import get_trajectory
    from ov_plane_tpu.utils.config import sim_config

    REALTIME_FPS = 20.0                       # EuRoC camera rate = realtime 1x
    N_FRAMES = int(os.environ.get("BENCH_VISION_FRAMES", "80"))
    WARMUP = 10
    # The renderer is a camera stand-in, and real cameras emit 8-bit mono
    # (the reference ingests u8, TrackPlane.cpp:463; EuRoC PNGs are u8) — so
    # frames are quantized to the 8-bit lattice AT THE SOURCE (_make_image's
    # ADC step). The driver's wire guard (frontend/wire_guard.py) then
    # resolves its 'auto' defaults to the fast modes because they are exactly
    # safe: the u8 wire (4x less transfer — a 32-stream f32 frame-batch is
    # ~39 MB ≈ 1.3 s through the axon tunnel) is bit-lossless on a u8-lattice
    # source, and bf16 patch rounding sits at/below the source's own
    # quantization floor. Safe-by-construction, not safe-by-scene-selection;
    # OVP_IMG_WIRE/OVP_KLT_SAMPLER still override for A/Bs.

    cfg = sim_config()
    cfg.sim.traj_duration = max(6.0, (N_FRAMES + 2) / 20.0)
    cfg.sim.freq_cam = 20.0
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.plane_init_min_feat = 8
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 15
    cfg.num_pts_plane = 40
    cfg.cam_wh = [640, 480]
    cfg.cam_intrinsics = [300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    # Info-form compression everywhere (classic + plane paths): the TPU QR
    # custom call is latency-bound in the column count regardless of rows;
    # the gram form is one MXU contraction + a [C,C] Cholesky (round-4
    # profile: the plane machinery was 79 ms of the 134 ms filter at B=32,
    # dominated by per-candidate QRs).
    cfg.tpu.use_info_compression = True
    cfg.trackplane.min_norms = 3
    cfg.trackplane.max_norm_avg_var = 30.0
    cfg.trackplane.max_norm_avg_max = 30.0
    cfg.msckf_options.chi2_multipler = 5.0
    cfg.sim.min_feature_gen_distance = 0.7
    cfg.sim.max_feature_gen_distance = 2.0
    # Same protocol tuning as run_euroc --sim-calib --use-planes: the plane-fit
    # cond gate acts on raw global coordinates and this room-scan orbits the
    # world origin (healthy clusters measure cond 40-260), and the synthetic
    # renderer's KLT noise is ~2 px.
    cfg.state.plane_init_max_cond = 150.0
    cfg.state.plane_msckf_max_cond = 150.0
    cfg.msckf_options.sigma_pix = 2.0
    cfg.slam_options.sigma_pix = 2.0

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        sim = build_sim(cfg, max_obs=64)
    _, traj_pos, _ = get_trajectory(cfg.sim)
    planes = generate_planes(traj_pos, cfg.sim.min_feature_gen_distance)

    R_ItoC = np.asarray(quat_2_rot(jnp.asarray(cfg.cam_extrinsics[0:4])))
    p_IinC = np.asarray(cfg.cam_extrinsics[4:7])
    zeta = np.asarray(cfg.cam_intrinsics)
    feat_p = np.asarray(sim.feat_p)
    n = min(N_FRAMES, sim.cam_t_imu.shape[0] - 1)
    # The render stands in for the camera and is untimed, but it costs
    # ~10 s/frame of host CPU under load — cache it on disk keyed by the
    # scene-determining knobs so repeat bench invocations start immediately.
    cache_key = f"n{n}_w{cfg.cam_wh[0]}x{cfg.cam_wh[1]}_d{cfg.sim.traj_duration:.1f}"
    cache_path = os.environ.get("BENCH_FRAME_CACHE",
                                f"/tmp/bench_frames_{cache_key}.npz")
    frames = None
    if cache_path and os.path.exists(cache_path):
        try:
            z = np.load(cache_path)
            if z["frames"].shape[0] == n:
                frames = list(z["frames"])
                print(f"[bench] loaded {n} cached frames from {cache_path}",
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — fall back to rendering
            print(f"[bench] frame cache unreadable ({e}); re-rendering",
                  file=sys.stderr)
    if frames is None:
        frames = []
        for i in range(1, n + 1):
            R_GtoI = np.asarray(quat_2_rot(sim.gt_q[i]))
            frames.append(render_frame_textured(
                planes.corners, planes.normal, planes.d, feat_p, R_GtoI,
                np.asarray(sim.gt_p[i]), R_ItoC, p_IinC, zeta, cfg.cam_wh, blobs=False))
        print(f"[bench] rendered {n} frames in {time.time()-t0:.1f}s (host, untimed)",
              file=sys.stderr)
        if cache_path:
            try:
                np.savez_compressed(cache_path, frames=np.stack(frames))
            except Exception:  # noqa: BLE001 — cache is best-effort
                pass

    eng = VioEngine.from_config(cfg)
    # On the accelerator the filter runs f32 (validated ≡ f64 on this
    # workload; f64 matmuls are emulated on TPU); CPU keeps f64.
    accel = _accel_device()
    on_tpu = accel.platform not in ("cpu",)
    dt = jnp.float32 if on_tpu else jnp.float64
    fused = os.environ.get("BENCH_VISION_FUSED", "1") == "1"
    # B=64 is the round-4 headline serving configuration on the chip (the
    # program is latency-dominated, so the wider batch raises aggregate fps
    # at near-constant wall); CPU smoke runs keep the lighter default.
    Bv = int(os.environ.get("BENCH_VISION_BATCH", "64" if on_tpu else "8"))
    state = init_state_with_gt(
        eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0],
        v0=sim.gt_v[0], bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0], dtype=dt)
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=dt)
    imu_t, imu_w, imu_a = map(np.asarray, (sim.imu_t, sim.imu_w, sim.imu_a))
    print(f"[bench] vision device: {accel} filter dtype: {dt.__name__} "
          f"fused={fused} batch={Bv}", file=sys.stderr)

    W = cfg.tpu.max_imu_per_frame
    # Host copies of the per-frame scalars: indexing the device-resident sim
    # arrays inside the loop (int(sim.imu_window_start[i]),
    # float(sim.cam_t_imu[i])) costs ~2 relay round-trips PER FRAME through
    # the axon tunnel — measured as the entire 160 ms/frame-batch
    # "loop_prep" in the round-5 wall decomposition.
    win_start_h = np.asarray(sim.imu_window_start)
    cam_t_h = np.asarray(sim.cam_t_imu)

    def imu_window(i):
        s0 = int(win_start_h[i])
        it = np.full(W, np.inf)
        iw = np.zeros((W, 3))
        ia = np.zeros((W, 3))
        m = len(imu_t[s0:s0 + W])
        it[:m] = imu_t[s0:s0 + W]
        iw[:m] = imu_w[s0:s0 + W]
        ia[:m] = imu_a[s0:s0 + W]
        return it, iw, ia

    n_init, n_constr, max_planes = 0, 0, 0
    stage_dev, stage_plane = [], []
    stage_all = {}

    if fused:
        # One-dispatch frontend+filter program (frontend/fused.py): the
        # TPU-native vision path. BENCH_VISION_BATCH=B vmaps it over B
        # streams (each stream gets per-stream pixel noise so the batch is
        # genuinely distinct computation — same rationale as the sim bench).
        from ov_plane_tpu.frontend.fused import FusedVisionDriver
        from ov_plane_tpu.parallel.ingest import Prefetcher

        # Default-ON since round 4: the headline is the sustained on-chip
        # capability with the tunnel wire amortized away (VERDICT r3 #1) —
        # 249.1 fps aggregate at B=64 with the full plane loop firing.
        resident = os.environ.get("BENCH_VISION_RESIDENT", "1") == "1"
        # Chain K frames into one dispatch (BENCH_VISION_CHAIN=K): the tunnel
        # charges ~3 RTTs per dispatch regardless of its size — measured
        # round 4: per-dispatch wall 218 ms at B=32 of which only ~35 ms is
        # device-visible work; chaining divides the fixed ~100 ms RTT cost
        # by K. Host plane labels then lag K+1 frames instead of 2.
        chain = int(os.environ.get("BENCH_VISION_CHAIN", "1"))
        if resident and Bv > 1:
            # Images are on-device; the serial B-stream host plane loop would
            # become the critical path — spread it over the host cores.
            os.environ.setdefault("OVP_PLANE_THREADS", "4")
        drv = FusedVisionDriver(cfg, eng, batch=Bv if Bv > 1 else 0,
                                chain=chain if Bv > 1 else 1)
        fev = drv.init_frontend()
        if Bv > 1:
            rngv = np.random.default_rng(5)
            img_noise = rngv.normal(0.0, 0.01, (Bv, *frames[0].shape)).astype(np.float32)
            state = jax.tree.map(lambda x: jnp.stack([x] * Bv), state)
            bank = jax.tree.map(lambda x: jnp.stack([x] * Bv), bank)
            fev = jax.tree.map(lambda x: jnp.stack([x] * Bv), fev)

        # Image staging pipeline: the per-stream noise add + u8 quantization
        # (a 39 MB f32 pass at B=32) and the host→device upload (~10 MB u8
        # ≈ 330 ms through the axon tunnel — the single largest per-frame
        # cost) run on a background thread two frames ahead, overlapping the
        # device compute + host plane detection of the current frame
        # (drv.stage_image; BENCH_VISION_PREFETCH=0 restores inline staging).
        prefetch = os.environ.get("BENCH_VISION_PREFETCH", "1") == "1"

        def _make_image(i):
            if Bv > 1:
                x = np.clip(frames[i - 1][None] + img_noise, 0.0, 1.0)
            else:
                x = frames[i - 1]
            # Camera ADC: quantize to the 8-bit lattice at the source (what a
            # real sensor does). The wire guard then takes u8/mm_bf16 exactly.
            return np.rint(x * np.float32(255.0)) * np.float32(1.0 / 255.0)

        # Device-resident frame ring (BENCH_VISION_RESIDENT=1): stage EVERY
        # frame-batch on the device up front (untimed — it stands in for the
        # camera/DMA feeding a locally-attached chip) and run the steady loop
        # with ZERO per-frame host→device image uploads. This is the sustained
        # on-chip capability measurement (VERDICT r3 #1): at B=32 each u8
        # frame-batch is ~9.8 MB, so an 80-frame ring is ~0.8 GB of HBM — the
        # axon tunnel (~30 MB/s) pays it once, before the timer starts.
        if chain > 1 and Bv > 1:
            # ---- K-frame chained dispatch loop --------------------------
            K = chain
            n_chunks = n // K
            warm_c = -(-WARMUP // K)          # ceil: first warm_c chunks warm up
            _mk_chunk = lambda c: np.stack(
                [_make_image(c * K + k + 1) for k in range(K)])
            if resident:
                t_res = time.time()
                staged = [drv.stage_chunk(_mk_chunk(c)) for c in range(n_chunks)]
                jax.block_until_ready(staged)
                mb = sum(x.size * x.dtype.itemsize for x in staged) / 1e6
                print(f"[bench] device-resident ring: {n_chunks} chunks x {K} "
                      f"frames ({mb:.0f} MB) staged in {time.time()-t_res:.1f}s "
                      f"(untimed)", file=sys.stderr)
                img_iter = iter(staged)
            elif prefetch:
                img_iter = Prefetcher((_mk_chunk(c) for c in range(n_chunks)),
                                      stage=drv.stage_chunk, depth=2)
            else:
                img_iter = (_mk_chunk(c) for c in range(n_chunks))

            t_steady = None
            t_loop0 = time.time()
            for c in range(n_chunks):
                if c == warm_c:
                    t_steady = time.time()
                wins = [imu_window(c * K + k + 1) for k in range(K)]
                it_c = np.stack([np.tile(w[0], (Bv, 1)) for w in wins])
                iw_c = np.stack([np.tile(w[1], (Bv, 1, 1)) for w in wins])
                ia_c = np.stack([np.tile(w[2], (Bv, 1, 1)) for w in wins])
                tn_c = np.stack([np.full(Bv, float(cam_t_h[c * K + k + 1]))
                                 for k in range(K)])
                state, bank, fev, out = drv.step_batch_chunk(
                    state, bank, fev, next(img_iter), it_c, iw_c, ia_c, tn_c)
                cnt = drv.last_counters
                n_init += int(cnt[:, 0].sum())
                n_constr += int(cnt[:, 1].sum())
                max_planes = max(max_planes, int(cnt[:, 2].max()))
                if c >= warm_c:
                    stage_dev.append(drv.last_times["device"] / K)
                    stage_plane.append(drv.last_times["host_plane"] / K)
            drv.flush_stream()
            wall = time.time() - (t_steady or t_loop0)
            n_timed = (n_chunks - warm_c) * K * Bv
            fps = n_timed / wall
            print(f"[bench] FUSED vision (chain={K}): "
                  f"{(n_chunks - warm_c) * K} steady frames x {Bv} streams in "
                  f"{wall:.2f}s; stages(ms/frame): "
                  f"device={1e3*np.mean(stage_dev):.1f} "
                  f"host_plane={1e3*np.mean(stage_plane):.1f}; "
                  f"plane_init={n_init} constraints={n_constr} "
                  f"max_planes={max_planes}", file=sys.stderr)
            print(json.dumps({
                "metric": "vision_vio_frames_per_sec_single_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / REALTIME_FPS, 3),
            }))
            return

        if resident:
            t_res = time.time()
            staged = [drv.stage_image(_make_image(i)) for i in range(1, n + 1)]
            jax.block_until_ready(staged)
            mb = sum(x.size * x.dtype.itemsize for x in staged) / 1e6
            print(f"[bench] device-resident ring: {n} frame-batches "
                  f"({mb:.0f} MB) staged in {time.time()-t_res:.1f}s (untimed)",
                  file=sys.stderr)
            img_iter = iter(staged)
        elif prefetch:
            img_iter = Prefetcher((_make_image(i) for i in range(1, n + 1)),
                                  stage=drv.stage_image, depth=2)
        else:
            img_iter = (_make_image(i) for i in range(1, n + 1))

        t_steady = None
        t_loop0 = time.time()
        for i in range(1, n + 1):
            if i == WARMUP + 1:
                t_steady = time.time()
            t_prep0 = time.perf_counter()
            it, iw, ia = imu_window(i)
            tn = float(cam_t_h[i])
            img_i = next(img_iter)
            if Bv > 1:
                it_b, iw_b, ia_b = (np.tile(it, (Bv, 1)), np.tile(iw, (Bv, 1, 1)),
                                    np.tile(ia, (Bv, 1, 1)))
                tn_b = np.full(Bv, tn)
            if i > WARMUP:
                stage_all.setdefault("loop_prep", []).append(
                    time.perf_counter() - t_prep0)
            # Counters come from the driver's packed pull (reading them off
            # `out` would cost one ~30 ms relay round trip EACH).
            if Bv > 1:
                state, bank, fev, out = drv.step_batch(
                    state, bank, fev, img_i, it_b, iw_b, ia_b, tn_b)
            else:
                state, bank, fev, out = drv.step_stream(
                    state, bank, fev, img_i, it, iw, ia, tn)
            cnt = drv.last_counters
            n_init += int(cnt[:, 0].sum())
            n_constr += int(cnt[:, 1].sum())
            max_planes = max(max_planes, int(cnt[:, 2].max()))
            if i > WARMUP:
                stage_dev.append(drv.last_times["device"])
                stage_plane.append(drv.last_times["host_plane"])
                for k, v in drv.last_times.items():
                    stage_all.setdefault(k, []).append(v)
        wall = time.time() - (t_steady or t_loop0)
        n_timed = (n - WARMUP) * max(Bv, 1)
        fps = n_timed / wall
        print(f"[bench] FUSED vision: {n - WARMUP} steady frames x {max(Bv, 1)} streams "
              f"in {wall:.2f}s; stages(ms/frame): device={1e3*np.mean(stage_dev):.1f} "
              f"host_plane={1e3*np.mean(stage_plane):.1f}; "
              f"plane_init={n_init} constraints={n_constr} max_planes={max_planes}",
              file=sys.stderr)
        # Full per-frame-batch wall decomposition (VERDICT r4 #3): every
        # timed sub-stage of the dispatch window, plus the loop residue
        # (= wall not inside step_batch — imu tiling, iterator, bookkeeping).
        if stage_all:
            per_fb = wall / max(n - WARMUP, 1)
            rows = {k: 1e3 * float(np.mean(v)) for k, v in stage_all.items()}
            inside = rows.get("device", 0.0) + rows.get("host_plane", 0.0)
            rows["loop_residue"] = 1e3 * per_fb - inside
            print("[bench] wall decomposition (ms per frame-batch, steady): "
                  + " ".join(f"{k}={v:.1f}" for k, v in sorted(rows.items()))
                  + f" | wall/frame-batch={1e3*per_fb:.1f}", file=sys.stderr)
    else:
        pipe = VisionPipeline(cfg, eng)

        def cast_frame(fr):
            return jax.tree.map(
                lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, fr)

        stage_track, stage_step = [], []
        t_loop0 = time.time()
        t_steady = None
        for i in range(1, n + 1):
            if i == WARMUP + 1:
                t_steady = time.time()
            start = int(sim.imu_window_start[i])
            end = min(start + W, len(imu_t))
            t_a = time.perf_counter()
            obs = pipe.process_image(frames[i - 1], state, bank,
                                     imu_t=imu_t[start:end], imu_w=imu_w[start:end],
                                     t_new=float(sim.cam_t_imu[i]))
            t_b = time.perf_counter()
            frame = cast_frame(pipe.make_frame(obs, imu_t[start:end], imu_w[start:end],
                                               imu_a[start:end], float(sim.cam_t_imu[i])))
            state, bank, out = step(eng, state, bank, frame)
            jax.block_until_ready(out.p)
            t_c = time.perf_counter()
            if i > WARMUP:
                stage_track.append(t_b - t_a - pipe.last_plane_stats.get("total", 0.0))
                stage_plane.append(pipe.last_plane_stats.get("total", 0.0))
                stage_step.append(t_c - t_b)
            n_init += int(out.n_plane_init)
            n_constr += int(out.n_plane_constraints)
            max_planes = max(max_planes, int(out.n_planes))
        wall = time.time() - (t_steady or t_loop0)
        n_timed = n - WARMUP
        fps = n_timed / wall
        print(f"[bench] vision path (UNFUSED): {n_timed} steady frames in {wall:.2f}s; "
              f"stages(ms): track={1e3*np.mean(stage_track):.1f} "
              f"plane={1e3*np.mean(stage_plane):.1f} filter={1e3*np.mean(stage_step):.1f}; "
              f"plane_init={n_init} constraints={n_constr} max_planes={max_planes}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "vision_vio_frames_per_sec_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REALTIME_FPS, 3),
    }))


def main():
    from ov_plane_tpu.eval.metrics import rmse_nees
    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt, run_sequence
    from ov_plane_tpu.sim.simulator import NoiseParams, apply_noise, build_sim
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.sim.traj_duration = 30.0
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 60
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 192
    cfg.tpu.max_obs_per_frame = 96
    cfg.tpu.max_msckf_update = 40
    cfg.tpu.use_info_compression = True  # fused Pallas gram reduction on TPU
    # Point-only milestone (config 1): no plane states in this workload, so
    # carry the minimum plane capacity. Together with the disabled-calib
    # layout (no dt/pose/intr columns) the error state is D = 15 + 6*12 + 3 + 3
    # = 93 — inside one 128-lane TPU tile (round 2 ran D=129, paying ~2x tile
    # padding in every covariance op; BASELINE.md bottleneck analysis).
    cfg.tpu.max_planes = 1

    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    # f32 on the accelerator: validated to match f64 RMSE/NEES on this
    # workload (30 s sim, identical to 3 decimals); f64 would be emulated on
    # TPU with ~10x compile+runtime cost.
    dt = jnp.float32 if os.environ.get("BENCH_DTYPE", "f32") == "f32" else jnp.float64
    sim = jax.tree.map(lambda x: x.astype(dt) if x.dtype == jnp.float64 else x, sim)
    n_frames = int(sim.cam_t_imu.shape[0]) - 1
    print(f"[bench] sim built in {time.time()-t0:.1f}s ({n_frames} frames)", file=sys.stderr)

    accel = _accel_device()
    print(f"[bench] accelerator: {accel}", file=sys.stderr)
    sim = jax.device_put(sim, accel)
    eng = VioEngine.from_config(cfg)

    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=1.0 / cfg.sim.freq_imu,
    )

    def one_run(key):
        # Genuinely distinct per-member measurement noise: without this, every
        # batch row is the identical computation and XLA hoists it out of the
        # vmap — the "batch" then measures ONE sequence broadcast B times.
        sim_k = apply_noise(sim, key, noise)
        state = init_state_with_gt(
            eng, cfg, t0=sim_k.cam_t_imu[0], q0=sim_k.gt_q[0], p0=sim_k.gt_p[0], v0=sim_k.gt_v[0],
            bg0=sim_k.gt_bg_cam[0], ba0=sim_k.gt_ba_cam[0], dtype=dt,
        )
        bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=dt)
        _, _, outs = run_sequence(eng, state, bank, sim_k, imu_window=cfg.tpu.max_imu_per_frame,
                                  unroll=UNROLL)
        return outs.p, outs.q, outs.cov_diag_imu

    batched = jax.jit(jax.vmap(one_run))
    seeds = jax.device_put(jax.random.split(jax.random.PRNGKey(7), BATCH), accel)

    t0 = time.time()
    p, q, cov = batched(seeds)
    jax.block_until_ready(p)
    compile_wall = time.time() - t0
    print(f"[bench] first run (incl. compile): {compile_wall:.1f}s", file=sys.stderr)

    # Time on FRESH keys: the axon relay memoizes (executable, inputs) pairs,
    # so re-running the identical batch returns instantly and would report a
    # fantasy number. New seeds force a genuine device execution.
    seeds2 = jax.device_put(jax.random.split(jax.random.PRNGKey(11), BATCH), accel)
    t0 = time.time()
    p, q, cov = batched(seeds2)
    jax.block_until_ready(p)
    wall = time.time() - t0

    fps = BATCH * n_frames / wall
    metric_fn = jax.jit(rmse_nees)
    f64 = lambda x: jax.device_put(x, cpu).astype(jnp.float64)
    with jax.default_device(cpu):
        m = metric_fn(
            f64(q[0]), f64(p[0]), f64(cov[0][:, 0:3]), f64(cov[0][:, 3:6]),
            f64(sim.gt_q[1:]), f64(sim.gt_p[1:]),
        )
    print(
        f"[bench] {BATCH}x{n_frames} frames in {wall:.2f}s; "
        f"rmse_pos={float(m['rmse_pos']):.3f}m rmse_ori={float(m['rmse_ori_deg']):.3f}deg "
        f"nees=({float(m['nees_ori']):.2f},{float(m['nees_pos']):.2f})",
        file=sys.stderr,
    )
    if not (float(m["rmse_pos"]) < 0.5):
        print("[bench] WARNING: accuracy degraded", file=sys.stderr)

    print(json.dumps({
        "metric": "sim_vio_frames_per_sec_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_CPU_FPS, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE", "vision") == "vision":
        main_vision()
    else:
        main()
