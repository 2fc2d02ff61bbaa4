"""Real-data frontend pipeline: images + IMU → filter frames.

The ros1_serial_msckf-equivalent driver (minus ROS): consumes time-sorted
image and IMU streams, runs the device-side vision frontend (KLT tracking +
FAST top-up), triangulates active tracks (batched, device), runs the
host-side plane detector, and emits the same fixed-shape ``FrameData`` +
plane associations the simulated path feeds the filter
(VioManager::track_image_and_update / feed_measurement_camera analogue,
VioManager.cpp:267-328).

State machine:
  uninitialized → static_initialize on the IMU ring → initialized; each camera
  frame then: [optional ZUPT] → KLT → detect top-up → plane detect → step.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend import fast as ffast
from ov_plane_tpu.frontend import klt as fklt
from ov_plane_tpu.frontend.plane_track import PlaneTracker
from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.manager import FrameData, VioEngine, step
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.config import VioConfig


def np_quat_2_rot(q: np.ndarray) -> np.ndarray:
    """Host (numpy) JPL quaternion → R_GtoL; same convention as ops.quat.

    The pipeline's per-frame pose bookkeeping is a handful of 3×3 products —
    running them as eager JAX ops cost a device dispatch each (tens of ms per
    frame through the remote-TPU tunnel); host numpy is effectively free.
    """
    qv, w = np.asarray(q[:3], float), float(q[3])
    sk = np.array([[0, -qv[2], qv[1]], [qv[2], 0, -qv[0]], [-qv[1], qv[0], 0.0]])
    return (2 * w * w - 1) * np.eye(3) - 2 * w * sk + 2 * np.outer(qv, qv)


def np_cam_pose(state: VioState, slot: int):
    """(R_GtoC, p_CinG) of clone `slot`, computed on the host."""
    R_GtoI = np_quat_2_rot(np.asarray(state.clones_q[slot]))
    p_IinG = np.asarray(state.clones_p[slot], float)
    R_ItoC = np_quat_2_rot(np.asarray(state.calib_cam[0:4]))
    p_IinC = np.asarray(state.calib_cam[4:7], float)
    return R_ItoC @ R_GtoI, p_IinG - R_GtoI.T @ (R_ItoC.T @ p_IinC)


@dataclass
class FrontendState:
    """Host-side tracker state between frames.

    Fixed-capacity slot arrays (ids/uv/valid all [cap]): every jitted frontend
    program (KLT, RANSAC, FAST, triangulation) then sees ONE shape for the
    whole run. Variable-length arrays here caused a fresh XLA compile per
    frame whose JIT mappings accumulated until vm.max_map_count was exhausted
    (LLVM "Cannot allocate memory" → SIGSEGV ~100 frames in) and made every
    TPU frame a remote compile.
    """

    cap: int = 128
    prev_pyr: Optional[tuple] = None
    ids: np.ndarray = None
    uv: np.ndarray = None
    valid: np.ndarray = None
    next_id: int = 1
    plane_tracker: PlaneTracker = field(default_factory=PlaneTracker)

    def __post_init__(self):
        if self.ids is None:
            self.ids = np.full(self.cap, -1, np.int64)
        if self.uv is None:
            self.uv = np.zeros((self.cap, 2), np.float64)
        if self.valid is None:
            self.valid = np.zeros(self.cap, bool)
        # Incremental whole-track triangulation (TrackPlane.cpp:626-694):
        # per-slot accumulated 3x3 system A p = b over the feature's ENTIRE
        # track — far longer baseline than the clone window, which is what
        # makes the triangle normals clean enough for plane clustering.
        self.tri_A = np.zeros((self.cap, 3, 3))
        self.tri_b = np.zeros((self.cap, 3))
        # Scalar completing the accumulated quadratic Σ‖(I−bbᵀ)(p−c_i)‖² =
        # pᵀAp − 2bᵀp + tri_c: gives the track's ray-intersection RMS without
        # storing per-observation rays (the whole-track residual gate).
        self.tri_c = np.zeros(self.cap)
        self.tri_n = np.zeros(self.cap, np.int32)
        # Rolling per-slot pixel history (oldest first) for the track-history
        # debug image (eval/trackviz.draw_history; reference
        # VioManager::get_historical_viz_image).
        self.hist_len = 15
        self.hist_uv = np.zeros((self.hist_len, self.cap, 2))
        self.hist_valid = np.zeros((self.hist_len, self.cap), bool)

    def reset_slots(self, idx):
        self.tri_A[idx] = 0.0
        self.tri_b[idx] = 0.0
        self.tri_c[idx] = 0.0
        self.tri_n[idx] = 0
        self.hist_valid[:, idx] = False

    def push_history(self):
        self.hist_uv[:-1] = self.hist_uv[1:]
        self.hist_valid[:-1] = self.hist_valid[1:]
        self.hist_uv[-1] = self.uv
        self.hist_valid[-1] = self.valid


def solve_track_triangulations(fe: "FrontendState", tp, R_GtoC, p_CinG) -> dict:
    """Solve every mature slot's accumulated whole-track system (batched 3x3)
    and apply the reference's gates (TrackPlane.cpp:668-680: condition number,
    in-front depth window, finiteness) plus the whole-track ray-intersection
    RMS gate Σ‖(I−bbᵀ)(p−c_i)‖² = pᵀAp−2bᵀp+c ≤ max(rel·depth, abs).

    Returns a dict with the solved positions and every intermediate gate
    array so diagnostics (scripts/diag_frontend_gates.py) read the same math
    the pipeline uses."""
    enough = fe.valid & (fe.tri_n >= tp.feat_init_min_obs)
    # Ridge: zero-baseline tracks leave the projector sum rank-2 (exactly
    # singular — np.linalg.solve raises); the gates below reject the
    # nonsense solution, the ridge only keeps the batched solve defined.
    ridge = 1e-6 * (np.einsum("nii->n", fe.tri_A) + 1.0)
    A = fe.tri_A + (np.where(enough, 0.0, 1.0) + ridge)[:, None, None] * np.eye(3)
    with np.errstate(all="ignore"):
        p3 = np.linalg.solve(A, fe.tri_b[..., None])[..., 0]
        sv = np.linalg.svd(fe.tri_A, compute_uv=False)
        cond = sv[:, 0] / np.maximum(sv[:, 2], 1e-18)
    depth = (p3 - p_CinG) @ np.asarray(R_GtoC)[2]
    quad = (np.einsum("ni,nij,nj->n", p3, fe.tri_A, p3)
            - 2.0 * np.einsum("ni,ni->n", p3, fe.tri_b) + fe.tri_c)
    ray_rms = np.sqrt(np.maximum(quad, 0.0) / np.maximum(fe.tri_n, 1))
    rms_gate = np.maximum(tp.max_ray_rms_rel * np.abs(depth), tp.max_ray_rms_abs)
    ok = (enough & (cond <= tp.max_cond_number)
          & (depth >= tp.min_dist) & (depth <= tp.max_dist)
          & (ray_rms <= rms_gate)
          & np.isfinite(p3).all(axis=1))
    return {"p3": p3, "ok": ok, "enough": enough, "cond": cond, "depth": depth,
            "ray_rms": ray_rms, "rms_gate": rms_gate}


class VisionPipeline:
    """Composable frontend for real image streams."""

    def __init__(self, cfg: VioConfig, eng: VioEngine):
        self.cfg = cfg
        self.eng = eng
        # Reference geometry: 15x15 LK window, 5 pyramid levels
        # (TrackPlane.h:231-232). The predicted-pose prior starts LK near the
        # optimum, so 8 Newton iterations replace OpenCV's 30-with-eps.
        self.klt_opts = fklt.KltOptions(levels=5, window=7, iters=8)
        cap = max(cfg.tpu.max_obs_per_frame, cfg.num_pts + cfg.num_pts_plane)
        self.fast_opts = ffast.FastOptions(
            threshold=cfg.fast_threshold / 255.0,
            grid_x=cfg.grid_x, grid_y=cfg.grid_y,
            max_features=cfg.num_pts + cfg.num_pts_plane,
        )
        self.fe = FrontendState(cap=cap, plane_tracker=PlaneTracker(cfg.trackplane))
        self.last_plane_stats: dict = {}
        self.last_tri = None  # (ids, uv, p3, ok3) whole-track triangulations
        self.aruco = None
        if cfg.use_aruco:
            from ov_plane_tpu.frontend.aruco import ArucoOptions, ArucoTracker

            self.aruco = ArucoTracker(ArucoOptions(downsize=cfg.downsize_aruco))
            # Natural-feature ids start above the reserved ArUco range
            # (TrackAruco semantics: currid = 4*max_aruco + 1).
            self.fe.next_id = max(self.fe.next_id, self.aruco.first_free_id)

    def process_image(self, img: np.ndarray, state: VioState, bank: fb.FeatureBank,
                      imu_t=None, imu_w=None, t_new=None):
        """Track features into the new image, top up detections, detect planes.

        img: [H, W] float in [0, 1]. When (imu_t, imu_w) covering the
        inter-frame interval are given, tracked matches are gated by the
        gyro-aided 2-point RANSAC (the reference's F-matrix RANSAC stage,
        TrackPlane.cpp:1299-1357). Returns (obs_id, obs_uv, obs_plane).
        """
        cfg = self.cfg
        h, w = img.shape
        from ov_plane_tpu.frontend import imageproc as ip

        method = {"NONE": ip.NONE, "HISTOGRAM": ip.HISTOGRAM, "CLAHE": ip.CLAHE}.get(
            cfg.histogram_method.upper(), ip.NONE)
        img_j = ip.preprocess(jnp.asarray(img, jnp.float32), method)
        pyr = fklt.prepare_pyramid(tuple(fklt.build_pyramid(img_j, self.klt_opts.levels)),
                                   self.klt_opts.window)
        fe = self.fe

        # 0. Gyro-integrated inter-frame rotation (shared by the LK prior and
        #    the RANSAC gate). IMU segment padded to a FIXED length so the
        #    integration compiles once (integrate_gyro zeroes the dt of
        #    non-finite padding); variable lengths would recompile per count.
        R_cam = None
        if imu_t is not None and imu_w is not None:
            from ov_plane_tpu.frontend.ransac import integrate_gyro

            I = cfg.tpu.max_imu_per_frame
            t_pad = np.full(I, np.inf)
            w_pad = np.zeros((I, 3))
            n_seg = min(len(np.asarray(imu_t)), I)
            t_pad[:n_seg] = np.asarray(imu_t)[:n_seg]
            w_pad[:n_seg] = np.asarray(imu_w)[:n_seg]
            # Clip the integration to the inter-frame interval. The caller's
            # window deliberately over-covers it (padding for searchsorted
            # slop); integrating the whole window would overestimate the
            # rotation by the window/frame-interval ratio, corrupting both
            # the LK prior and the RANSAC epipolar model.
            t_lo = float(state.t)
            t_hi = float(t_new) if t_new is not None else 1e30
            R_imu = integrate_gyro(jnp.asarray(t_pad), jnp.asarray(w_pad),
                                   t_lo, t_hi, state.imu[10:13])
            R_ItoC = jnp.asarray(np_quat_2_rot(np.asarray(state.calib_cam[0:4])),
                                 jnp.float32)
            R_imu = jnp.asarray(R_imu, jnp.float32)
            R_cam = R_ItoC @ R_imu @ R_ItoC.T

        from ov_plane_tpu.ops import cams

        zeta = state.cam_zeta
        und = jax.jit(jax.vmap(lambda uv: cams.undistort(uv, zeta, self.eng.cam_model)))

        # 0b. Incremental triangulation accumulation (TrackPlane.cpp:626-657):
        #     the pre-track uv's belong to the PREVIOUS image, whose pose is
        #     the state's newest clone (step() ran after that image). Rank-1
        #     update of each slot's 3x3 system with the bearing projector.
        if fe.prev_pyr is not None and fe.valid.any() and int(state.num_clones) >= 1:
            newest = int(np.asarray(state.newest_clone_slot))
            R_prev, p_prev = np_cam_pose(state, newest)
            uvn_all = np.asarray(und(jnp.asarray(fe.uv, jnp.float32)), np.float64)
            b_c = np.concatenate([uvn_all, np.ones((fe.cap, 1))], axis=1)
            b_g = b_c @ R_prev          # R_prev.T @ b per row
            b_g /= np.linalg.norm(b_g, axis=1, keepdims=True)
            Ai = np.eye(3)[None] - b_g[:, :, None] * b_g[:, None, :]
            v = fe.valid
            fe.tri_A[v] += Ai[v]
            fe.tri_b[v] += Ai[v] @ p_prev
            fe.tri_c[v] += np.einsum("nij,i,j->n", Ai[v], p_prev, p_prev)
            fe.tri_n[v] += 1

        # 1. KLT-track previous features (fixed [cap] slots, masked), seeded
        #    with a full predicted-pose flow prior when the gyro is available.
        #    Rotation dominates inter-frame pixel motion, but at close range
        #    (the plane regime: 0.7-2 m walls) translation-induced flow is
        #    tens of pixels too — outside LK's basin (~window per pyramid
        #    level). The prior propagates the previous pose by the integrated
        #    gyro rotation + the state velocity and reprojects each track at
        #    its whole-track triangulated depth (median scene depth for young
        #    tracks, rotation-only until any depth exists) — the analogue of
        #    the reference seeding LK with predicted positions.
        if fe.prev_pyr is not None and fe.valid.any():
            pts0 = jnp.asarray(fe.uv, jnp.float32)
            uvn_prev = und(pts0)
            init_flow = None
            if R_cam is not None:
                R_GtoI_prev = np_quat_2_rot(np.asarray(state.imu[0:4]))
                R_ItoC_np = np_quat_2_rot(np.asarray(state.calib_cam[0:4]))
                p_IinC_np = np.asarray(state.calib_cam[4:7])
                R_GtoC_prev = R_ItoC_np @ R_GtoI_prev
                R_cam_np = np.asarray(R_cam)               # C_prev → C_new
                R_GtoC_new = R_cam_np @ R_GtoC_prev
                p_I_prev = np.asarray(state.imu[4:7])
                v_IinG = np.asarray(state.imu[7:10])
                dt = max(float(t_new) - float(state.t), 0.0) if t_new is not None else 0.0
                p_C_prev = p_I_prev - R_GtoC_prev.T @ p_IinC_np
                p_C_new = (p_I_prev + v_IinG * dt) - R_GtoC_new.T @ p_IinC_np

                # Rough per-slot depth from the accumulated whole-track
                # systems (no gates — a coarse depth is enough for a prior).
                b_np = np.concatenate(
                    [np.asarray(uvn_prev, np.float64), np.ones((fe.cap, 1))], axis=1)
                has_tri = fe.valid & (fe.tri_n >= 2)
                # Ridge on every system: with zero baseline (stationary
                # platform) the accumulated projectors are rank-2 even at
                # tri_n >= 2 and np.linalg.solve RAISES on exact singularity.
                # The ridge keeps the solve defined; the garbage depth it
                # yields fails the min/max-dist gate below.
                ridge = 1e-6 * (np.einsum("nii->n", fe.tri_A) + 1.0)
                A = fe.tri_A + (np.where(has_tri, 0.0, 1.0) + ridge)[:, None, None] * np.eye(3)
                with np.errstate(all="ignore"):
                    p3r = np.linalg.solve(A, fe.tri_b[..., None])[..., 0]
                z = (p3r - p_C_prev) @ R_GtoC_prev[2]
                tp_o = cfg.trackplane
                good_d = (has_tri & np.isfinite(z)
                          & (z > tp_o.min_dist) & (z < tp_o.max_dist))
                med = float(np.median(z[good_d])) if good_d.any() else np.inf
                depth = np.where(good_d, z, med)
                finite_d = np.isfinite(depth) & fe.valid
                # Predicted direction in the new camera frame: full 3D point
                # reprojection where a depth exists, pure rotation otherwise
                # (infinite-depth limit of the same formula).
                pt_C_prev = b_np * np.where(finite_d, depth, 1.0)[:, None]
                pt_G = pt_C_prev @ R_GtoC_prev + p_C_prev
                pt_C_new = (pt_G - p_C_new) @ R_GtoC_new.T
                b_rot = b_np @ R_cam_np.T
                dir_new = jnp.asarray(np.where(finite_d[:, None], pt_C_new, b_rot),
                                      jnp.float32)
                pred = jax.vmap(lambda p: cams.project(p, zeta, self.eng.cam_model)[0])(dir_new)
                flow = (pred - pts0).astype(jnp.float32)
                # Trust the prior only where the predicted point stays in
                # front of the camera and the prediction is finite.
                good = (dir_new[:, 2] > 0.1) & jnp.all(jnp.isfinite(flow), axis=1)
                init_flow = jnp.where(good[:, None], flow, 0.0)
            p1, ok = fklt.track(fe.prev_pyr, pyr, pts0, jnp.asarray(fe.valid),
                                self.klt_opts, init_flow)
            ok_np = np.array(ok)  # writable copy (np.asarray of a jax array is read-only)

            # 1b. Gyro-aided RANSAC outlier gate over the tracked matches.
            if R_cam is not None and ok_np.sum() >= 8:
                from ov_plane_tpu.frontend.ransac import RansacOptions, gyro_ransac

                uvn_cur = und(p1)
                inl, _, _ = gyro_ransac(uvn_prev, uvn_cur, ok, R_cam, RansacOptions())
                ok_np = ok_np & np.asarray(inl)

            p1_np = np.asarray(p1)
            fe.uv = np.where(ok_np[:, None], p1_np, fe.uv)
            fe.valid = ok_np
            fe.ids = np.where(fe.valid, fe.ids, -1)
        else:
            fe.valid[:] = False
            fe.ids[:] = -1

        # 2. Top up with FAST detections away from existing tracks, written
        #    into free slots (detect_grid shape is capacity-fixed).
        n_needed = min(cfg.num_pts + cfg.num_pts_plane, fe.cap) - int(fe.valid.sum())
        if n_needed > 0:
            occupied = jnp.asarray(fe.uv, jnp.float32)
            occ_mask = jnp.asarray(fe.valid)
            new_uv, new_ok = ffast.detect_grid(pyr.imgs[0], occupied, occ_mask, self.fast_opts, h, w)
            new_uv = np.asarray(new_uv)[np.asarray(new_ok)][:n_needed]
            free = np.nonzero(~fe.valid)[0][: len(new_uv)]
            new_ids = np.arange(fe.next_id, fe.next_id + len(free))
            fe.next_id += len(free)
            fe.ids[free] = new_ids
            fe.uv[free] = new_uv[: len(free)]
            fe.valid[free] = True
            fe.reset_slots(free)

        fe.prev_pyr = pyr

        # 2b. ArUco corners: re-detected every frame with reserved stable ids
        #     (they override any KLT-tracked position for the same id).
        if self.aruco is not None:
            a_ids, a_uv = self.aruco.detect(img)
            if len(a_ids):
                # Drop any slot already carrying one of these ids, then place
                # the fiducial corners in free slots (evicting natural
                # features if the bank is full — they are priority features:
                # the reference routes them to SLAM ahead of natural ones).
                stale = np.isin(fe.ids, a_ids) & fe.valid
                fe.valid[stale] = False
                fe.ids[stale] = -1
                free = np.nonzero(~fe.valid)[0]
                if len(free) < len(a_ids):
                    evict = np.nonzero(fe.valid)[0][: len(a_ids) - len(free)]
                    fe.valid[evict] = False
                    fe.ids[evict] = -1
                    free = np.nonzero(~fe.valid)[0]
                free = free[: len(a_ids)]
                fe.ids[free] = a_ids[: len(free)]
                fe.uv[free] = a_uv[: len(free)]
                fe.valid[free] = True
                fe.reset_slots(free)

        fe.push_history()

        # 3. Triangulate active tracks from the bank window (device, batched)
        #    → plane detection on the host.
        feat2plane: dict = {}
        plane2old: dict = {}
        tp = cfg.trackplane
        _tri_t0 = _time.perf_counter()
        _tri_wall = 0.0
        tracker_ran = False
        if int(state.num_clones) >= 1 and (fe.tri_n >= tp.feat_init_min_obs).any():
            newest = int(np.asarray(state.newest_clone_slot))
            R_GtoC, p_CinG = np_cam_pose(state, newest)
            g = solve_track_triangulations(fe, tp, R_GtoC, p_CinG)
            p3, ok3 = g["p3"], g["ok"]
            _tri_wall = _time.perf_counter() - _tri_t0
            # Snapshot for the loop-closure info pack (eval/loopclosure.py ≡
            # VioManager::get_active_tracks, active_tracks_posinG).
            self.last_tri = (fe.ids.copy(), fe.uv.copy(), p3, ok3)
            if ok3.any():
                tracker_ran = True
                feat2plane, plane2old = fe.plane_tracker.update(
                    fe.ids, fe.uv, p3, ok3, R_GtoC, p_CinG
                )

        # Plane-tracking statistics row (reference get_tracking_info,
        # TrackPlane.cpp:387-461): frontend columns; the caller may add
        # `state planes` / `num constraint updates` after the filter step
        # before handing the row to eval.io.PlaneStatsRecorder.
        n_planes_front = len(set(feat2plane.values()))
        tl = fe.tri_n[fe.valid].astype(float)
        # Only report sub-stage times when the tracker actually ran this
        # frame (last_timing would otherwise be the previous frame's).
        tmg = fe.plane_tracker.last_timing if tracker_ran else {}
        self.last_plane_stats = {
            "feat/plane": (len(feat2plane) / n_planes_front) if n_planes_front else 0.0,
            "num plane": float(n_planes_front),
            "track length avg": float(tl.mean()) if len(tl) else 0.0,
            "track length std": float(tl.std()) if len(tl) else 0.0,
            "track length max": float(tl.max()) if len(tl) else 0.0,
            "num constraint updates": float(len(feat2plane)),
            "triangulation": _tri_wall,
            "delaunay": tmg.get("delaunay", 0.0),
            "matching": tmg.get("matching", 0.0),
            "total": _time.perf_counter() - _tri_t0,
        }

        # 4. Emit fixed-shape observation arrays. Fiducial (ArUco) ids go
        #    first so they survive the truncation to O entries.
        O = cfg.tpu.max_obs_per_frame
        obs_id = np.full(O, -1, np.int32)
        obs_uv = np.zeros((O, 2))
        obs_plane = np.full(O, -1, np.int32)
        sel = np.nonzero(fe.valid)[0]
        if self.aruco is not None and len(sel):
            pri = fe.ids[sel] < self.aruco.first_free_id
            sel = np.concatenate([sel[pri], sel[~pri]])
        sel = sel[:O]
        n = len(sel)
        obs_id[:n] = fe.ids[sel]
        obs_uv[:n] = fe.uv[sel]
        for k in range(n):
            obs_plane[k] = feat2plane.get(int(obs_id[k]), -1)

        # Merge pairs for the state's plane id bookkeeping (StateHelper::
        # merge_planes_and_marginalize input): apply via models.plane_init.merge_planes.
        Q = 8
        merge_from = np.full(Q, -1, np.int32)
        merge_into = np.full(Q, -1, np.int32)
        k = 0
        for into, olds in plane2old.items():
            for old in olds:
                if k < Q:
                    merge_from[k] = old
                    merge_into[k] = into
                    k += 1
        self.last_merges = (jnp.asarray(merge_from), jnp.asarray(merge_into))
        return jnp.asarray(obs_id), jnp.asarray(obs_uv), jnp.asarray(obs_plane)

    def make_frame(self, obs, imu_t, imu_w, imu_a, t_new) -> FrameData:
        obs_id, obs_uv, obs_plane = obs
        I = self.cfg.tpu.max_imu_per_frame
        def pad(x, fill):
            x = np.asarray(x)
            out = np.full((I, *x.shape[1:]), fill, x.dtype)
            out[: min(len(x), I)] = x[: I]
            return jnp.asarray(out)
        # Frontend plane-id merges recorded by the last process_image call
        # (applied in step() ≡ VioManager.cpp:516-533). Fixed [Q] shape so
        # the jitted step compiles once.
        mf, mi = getattr(self, "last_merges", (jnp.full(8, -1, jnp.int32),) * 2)
        return FrameData(
            imu_t=pad(imu_t, np.inf), imu_w=pad(imu_w, 0.0), imu_a=pad(imu_a, 0.0),
            t_new=jnp.asarray(t_new), obs_id=obs_id, obs_uv=obs_uv, obs_plane=obs_plane,
            merge_from=mf, merge_into=mi,
        )
