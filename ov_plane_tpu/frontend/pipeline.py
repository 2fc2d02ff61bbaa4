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

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend import fast as ffast
from ov_plane_tpu.frontend import klt as fklt
from ov_plane_tpu.frontend.plane_track import PlaneTracker
from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.jacobians import clone_set_from_state
from ov_plane_tpu.models.manager import FrameData, VioEngine, step
from ov_plane_tpu.ops.triangulation import TriangulationOptions, triangulate
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.config import VioConfig


@dataclass
class FrontendState:
    """Host-side tracker state between frames."""

    prev_pyr: Optional[tuple] = None
    ids: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    uv: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    next_id: int = 1
    plane_tracker: PlaneTracker = field(default_factory=PlaneTracker)


class VisionPipeline:
    """Composable frontend for real image streams."""

    def __init__(self, cfg: VioConfig, eng: VioEngine):
        self.cfg = cfg
        self.eng = eng
        self.klt_opts = fklt.KltOptions(levels=4, window=10)
        self.fast_opts = ffast.FastOptions(
            threshold=cfg.fast_threshold / 255.0,
            grid_x=cfg.grid_x, grid_y=cfg.grid_y,
            max_features=cfg.num_pts,
        )
        self.fe = FrontendState(plane_tracker=PlaneTracker(cfg.trackplane))
        self.aruco = None
        if cfg.use_aruco:
            from ov_plane_tpu.frontend.aruco import ArucoOptions, ArucoTracker

            self.aruco = ArucoTracker(ArucoOptions(downsize=cfg.downsize_aruco))
            # Natural-feature ids start above the reserved ArUco range
            # (TrackAruco semantics: currid = 4*max_aruco + 1).
            self.fe.next_id = max(self.fe.next_id, self.aruco.first_free_id)

    def process_image(self, img: np.ndarray, state: VioState, bank: fb.FeatureBank,
                      imu_t=None, imu_w=None):
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
        pyr = tuple(fklt.build_pyramid(img_j, self.klt_opts.levels))
        fe = self.fe

        # 1. KLT-track previous features.
        if fe.prev_pyr is not None and len(fe.ids) > 0:
            pts0 = jnp.asarray(fe.uv, jnp.float32)
            p1, ok = fklt.track(fe.prev_pyr, pyr, pts0, jnp.ones(len(fe.ids), bool), self.klt_opts)
            ok = np.asarray(ok)

            # 1b. Gyro-aided RANSAC outlier gate over the tracked matches.
            if imu_t is not None and imu_w is not None and ok.sum() >= 8:
                from ov_plane_tpu.frontend.ransac import RansacOptions, gyro_ransac, integrate_gyro
                from ov_plane_tpu.ops import cams
                from ov_plane_tpu.ops.quat import quat_2_rot

                bg = state.imu[10:13]
                # Integrate the entire provided window (the caller passes the
                # inter-frame IMU segment; padding is masked by clipping).
                R_imu = integrate_gyro(jnp.asarray(imu_t), jnp.asarray(imu_w),
                                       -1e30, 1e30, bg)
                R_ItoC = quat_2_rot(state.calib_cam[0:4])
                R_cam = R_ItoC @ R_imu @ R_ItoC.T
                zeta = state.cam_zeta
                und = jax.vmap(lambda uv: cams.undistort(uv, zeta, self.eng.cam_model))
                uvn_prev = und(jnp.asarray(fe.uv))
                uvn_cur = und(p1)
                inl, _, _ = gyro_ransac(uvn_prev, uvn_cur, jnp.asarray(ok), R_cam, RansacOptions())
                ok = ok & np.asarray(inl)

            fe.ids = fe.ids[ok]
            fe.uv = np.asarray(p1)[ok]
        else:
            fe.ids = np.zeros(0, np.int64)
            fe.uv = np.zeros((0, 2))

        # 2. Top up with FAST detections away from existing tracks.
        n_needed = cfg.num_pts + cfg.num_pts_plane - len(fe.ids)
        if n_needed > 0:
            occupied = jnp.asarray(fe.uv if len(fe.uv) else np.zeros((1, 2)), jnp.float32)
            occ_mask = jnp.asarray(np.ones(max(len(fe.uv), 1), bool) if len(fe.uv) else np.zeros(1, bool))
            new_uv, new_ok = ffast.detect_grid(pyr[0], occupied, occ_mask, self.fast_opts, h, w)
            new_uv = np.asarray(new_uv)[np.asarray(new_ok)][:n_needed]
            new_ids = np.arange(self.fe.next_id, self.fe.next_id + len(new_uv))
            self.fe.next_id += len(new_uv)
            fe.ids = np.concatenate([fe.ids, new_ids])
            fe.uv = np.vstack([fe.uv, new_uv]) if len(fe.uv) else new_uv

        fe.prev_pyr = pyr

        # 2b. ArUco corners: re-detected every frame with reserved stable ids
        #     (they override any KLT-tracked position for the same id).
        if self.aruco is not None:
            a_ids, a_uv = self.aruco.detect(img)
            if len(a_ids):
                # Prepend: fiducial corners are priority features (the
                # reference routes them to SLAM ahead of natural features)
                # and must survive the fixed-size observation truncation.
                keep = ~np.isin(fe.ids, a_ids)
                fe.ids = np.concatenate([a_ids, fe.ids[keep]])
                fe.uv = np.vstack([a_uv, fe.uv[keep]]) if keep.any() else a_uv

        # 3. Triangulate active tracks from the bank window (device, batched)
        #    → plane detection on the host.
        feat2plane: dict = {}
        plane2old: dict = {}
        if int(state.num_clones) >= 3 and len(fe.ids) > 0:
            clone_active = np.asarray(jnp.isfinite(state.clones_t))
            clones = clone_set_from_state(state)
            bank_ids = np.asarray(bank.fid)
            eq = fe.ids[:, None] == bank_ids[None, :]
            has = eq.any(axis=1)
            rows = eq.argmax(axis=1)
            if has.any():
                uvn = bank.uvn[jnp.asarray(rows)]
                masks = bank.mask[jnp.asarray(rows)] & jnp.asarray(has)[:, None] & jnp.asarray(clone_active)[None, :]
                tri_opts = TriangulationOptions(min_dist=0.1, max_dist=60.0)
                p3, ok3 = triangulate(uvn, masks, clones.R_GtoC, clones.p_CinG, tri_opts)
                # Current camera pose = newest clone.
                newest = int(np.asarray(state.newest_clone_slot))
                R_GtoC = np.asarray(clones.R_GtoC[newest])
                p_CinG = np.asarray(clones.p_CinG[newest])
                feat2plane, plane2old = fe.plane_tracker.update(
                    fe.ids, fe.uv, np.asarray(p3), np.asarray(ok3) & has, R_GtoC, p_CinG
                )

        # 4. Emit fixed-shape observation arrays.
        O = cfg.tpu.max_obs_per_frame
        obs_id = np.full(O, -1, np.int32)
        obs_uv = np.zeros((O, 2))
        obs_plane = np.full(O, -1, np.int32)
        n = min(len(fe.ids), O)
        obs_id[:n] = fe.ids[:n]
        obs_uv[:n] = fe.uv[:n]
        for k in range(n):
            obs_plane[k] = feat2plane.get(int(fe.ids[k]), -1)

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
        return FrameData(
            imu_t=pad(imu_t, np.inf), imu_w=pad(imu_w, 0.0), imu_a=pad(imu_a, 0.0),
            t_new=jnp.asarray(t_new), obs_id=obs_id, obs_uv=obs_uv, obs_plane=obs_plane,
        )
