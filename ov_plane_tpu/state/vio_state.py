"""VioState: the filter state as a fixed-shape structure-of-arrays pytree.

Functional replacement for the reference's heap-allocated ``State``
(state/State.h:53: active IMU, clone map, SLAM landmarks, CP planes, calib,
dense covariance). Every field is a fixed-size array; "which slots are alive"
is carried in masks/timestamps, so the whole state threads through ``jit`` /
``lax.scan`` / ``vmap`` without retracing.

FEJ (first-estimate Jacobian) linearization points are stored alongside each
estimate, mirroring the reference's per-Type fej values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ov_plane_tpu.state.layout import StateLayout


@struct.dataclass
class VioState:
    """All arrays share a leading batch shape () — vmap for MC/sequence batches.

    Conventions: JPL quaternions [x,y,z,w] for R_GtoI; positions in global.
    """

    # Static layout (not a leaf).
    layout: StateLayout = struct.field(pytree_node=False)

    # Time of the current state estimate (CAMERA clock, matching the
    # reference: state->_timestamp is the camera time and the IMU-clock
    # mapping is t_imu = t_cam + calib_dt, Propagator.cpp:60-78).
    t: jnp.ndarray = None  # scalar f64
    # calib_dt estimate used for the LAST propagation (last_prop_time_offset).
    last_dt: jnp.ndarray = None
    # Time the filter was initialized (gates dt_slam_delay-style logic).
    startup_t: jnp.ndarray = None
    # Whether a normal (non-ZUPT) frame has been processed since startup
    # (gates zupt_only_at_beginning, VioManager has_moved_since_zupt).
    has_moved: jnp.ndarray = None

    # Active IMU state x16: [q(4), p(3), v(3), bg(3), ba(3)] (reference IMU Type order).
    imu: jnp.ndarray = None
    imu_fej: jnp.ndarray = None

    # Calibration: IMU-camera time offset, camera extrinsic pose [q_ItoC(4), p_IinC(3)],
    # camera intrinsics zeta[8].
    calib_dt: jnp.ndarray = None
    calib_cam: jnp.ndarray = None
    cam_zeta: jnp.ndarray = None

    # Clone window: [K] slots. clone_t = -inf marks a free slot.
    clones_q: jnp.ndarray = None     # [K, 4]
    clones_p: jnp.ndarray = None     # [K, 3]
    clones_q_fej: jnp.ndarray = None
    clones_p_fej: jnp.ndarray = None
    clones_t: jnp.ndarray = None     # [K]

    # SLAM point landmarks: [L] slots. slam_p holds the landmark's
    # REPRESENTATION PARAMETERS (= the global xyz for GLOBAL_3D; anchored
    # reps store anchor-frame params with the anchor clone slot recorded).
    slam_p: jnp.ndarray = None       # [L, 3]
    slam_p_fej: jnp.ndarray = None
    slam_id: jnp.ndarray = None      # [L] int32, feature id (-1 = free)
    slam_active: jnp.ndarray = None  # [L] bool
    slam_anchor_slot: jnp.ndarray = None  # [L] int32 clone slot (-1 = global rep)

    # CP plane landmarks: [P] slots.
    plane_cp: jnp.ndarray = None      # [P, 3]
    plane_cp_fej: jnp.ndarray = None
    plane_id: jnp.ndarray = None      # [P] int32 frontend plane id (-1 = free)
    plane_active: jnp.ndarray = None  # [P] bool

    # Dense covariance over the static error layout, [D, D].
    cov: jnp.ndarray = None

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, layout: StateLayout, dtype=jnp.float64) -> "VioState":
        K, L, P = layout.max_clones, layout.max_slam, layout.max_planes
        unit_q = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)
        imu = jnp.zeros(16, dtype).at[3].set(1.0)
        return cls(
            layout=layout,
            t=jnp.asarray(0.0, dtype),
            last_dt=jnp.asarray(0.0, dtype),
            startup_t=jnp.asarray(0.0, dtype),
            has_moved=jnp.asarray(False),
            imu=imu,
            imu_fej=imu,
            calib_dt=jnp.zeros((), dtype),
            calib_cam=jnp.concatenate([unit_q, jnp.zeros(3, dtype)]),
            cam_zeta=jnp.zeros(8, dtype),
            clones_q=jnp.tile(unit_q, (K, 1)),
            clones_p=jnp.zeros((K, 3), dtype),
            clones_q_fej=jnp.tile(unit_q, (K, 1)),
            clones_p_fej=jnp.zeros((K, 3), dtype),
            clones_t=jnp.full((K,), -jnp.inf, dtype),
            slam_p=jnp.zeros((L, 3), dtype),
            slam_p_fej=jnp.zeros((L, 3), dtype),
            slam_id=jnp.full((L,), -1, jnp.int32),
            slam_active=jnp.zeros((L,), bool),
            slam_anchor_slot=jnp.full((L,), -1, jnp.int32),
            plane_cp=jnp.zeros((P, 3), dtype),
            plane_cp_fej=jnp.zeros((P, 3), dtype),
            plane_id=jnp.full((P,), -1, jnp.int32),
            plane_active=jnp.zeros((P,), bool),
            cov=jnp.zeros((layout.dim, layout.dim), dtype),
        )

    # -- convenience views ---------------------------------------------------
    @property
    def imu_q(self):
        return self.imu[..., 0:4]

    @property
    def imu_p(self):
        return self.imu[..., 4:7]

    @property
    def imu_v(self):
        return self.imu[..., 7:10]

    @property
    def imu_bg(self):
        return self.imu[..., 10:13]

    @property
    def imu_ba(self):
        return self.imu[..., 13:16]

    @property
    def num_clones(self):
        return jnp.sum(jnp.isfinite(self.clones_t)).astype(jnp.int32)

    @property
    def oldest_clone_slot(self):
        """Slot index holding the oldest finite timestamp (margtimestep equivalent)."""
        return jnp.argmin(jnp.where(jnp.isfinite(self.clones_t), self.clones_t, jnp.inf))

    @property
    def newest_clone_slot(self):
        return jnp.argmax(jnp.where(jnp.isfinite(self.clones_t), self.clones_t, -jnp.inf))

    def dtype(self):
        return self.imu.dtype
