"""Trajectory / state recording and dataset loading.

Covers the reference's file surface (SURVEY.md Appendix B, §5.4-5.5):

* TUM-format trajectory records (`pose_to_file` via ov_eval,
  launch/serial.launch:97-103) — :func:`write_tum` / :func:`read_tum`;
* total-state dumps `timestamp q p v bg ba dt cam...`
  (ROSVisualizerHelper::sim_save_total_state_to_file,
  ROS1Visualizer.cpp:134-169) — :func:`write_total_state`;
* EuRoC ASL ground-truth csv (DatasetReader::load_gt_file) —
  :func:`read_euroc_gt`;
* per-stage timing CSV with the reference's exact column schema
  (VioManager.cpp:110-118) — :class:`TimingRecorder`.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

TIMING_COLUMNS = [
    "timestamp",
    "tracking",
    "propagation",
    "plane init",
    "msckf update",
    "slam update",
    "slam delayed",
    "re-tri & marg",
    "total",
]

PLANE_TRACK_COLUMNS = [
    "timestamp",
    "feat/plane",
    "num plane",
    "track length avg",
    "track length std",
    "track length max",
    "num constraint updates",
    "state planes",
    "triangulation",
    "delaunay",
    "matching",
    "total",
    # Extension beyond the reference schema (appended so the reference's
    # columns stay a positional prefix): qualifying out-of-state plane groups
    # that exceeded the static per-frame update cap (the reference has no cap,
    # UpdaterMSCKF.cpp:411-649 — nonzero here flags a capacity parity gap).
    "dropped plane updates",
]


def write_tum(path: str, times, pos, quat_GtoI):
    """TUM format: `t tx ty tz qx qy qz qw` with the quaternion as Hamilton
    q_ItoG. JPL q_GtoI has IDENTICAL components to Hamilton q_ItoG (verified
    numerically vs quat_2_rot; the reference's pose_to_file writes the state
    quaternion unmodified), so no conjugation — write as-is."""
    times = np.asarray(times)
    pos = np.asarray(pos)
    q_out = np.asarray(quat_GtoI)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# timestamp(s) tx ty tz qx qy qz qw\n")
        for i in range(len(times)):
            f.write(
                f"{times[i]:.9f} {pos[i,0]:.6f} {pos[i,1]:.6f} {pos[i,2]:.6f} "
                f"{q_out[i,0]:.6f} {q_out[i,1]:.6f} {q_out[i,2]:.6f} {q_out[i,3]:.6f}\n"
            )


def read_tum(path: str):
    data = np.loadtxt(path, comments="#")
    t = data[:, 0]
    pos = data[:, 1:4]
    # Hamilton q_ItoG (xyzw) == JPL q_GtoI component-wise: no conjugation.
    q_GtoI = data[:, 4:8].copy()
    # Re-normalize: text quantization (6 decimals) leaves |q| != 1 by ~1e-6,
    # which arccos amplifies to ~0.05 deg of phantom orientation error.
    q_GtoI = q_GtoI / np.linalg.norm(q_GtoI, axis=1, keepdims=True)
    return t, pos, q_GtoI


def write_total_state(path: str, times, imu16, calib_dt, cam_zeta, cam_ext):
    """`timestamp q(4) p(3) v(3) bg(3) ba(3) dt num_cam zeta(8) ext(7)`
    (ROS1Visualizer.cpp:158-159 schema)."""
    times = np.asarray(times)
    imu16 = np.asarray(imu16)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# timestamp(s) q p v bg ba cam_imu_dt num_cam cam0_intr cam0_ext\n")
        for i in range(len(times)):
            row = [times[i], *imu16[i], float(calib_dt[i]), 1, *np.asarray(cam_zeta[i]), *np.asarray(cam_ext[i])]
            f.write(" ".join(f"{v:.9f}" for v in row) + "\n")


def read_euroc_gt(path: str):
    """EuRoC ASL ground truth: `t[ns], p(3), q_wxyz(4), v(3), bw(3), ba(3)`.

    Returns (t_sec, pos, quat_GtoI_jpl, vel, bg, ba).
    """
    data = np.loadtxt(path, delimiter=",", comments="#", ndmin=2)
    t = data[:, 0] * 1e-9
    pos = data[:, 1:4]
    q_wxyz = data[:, 4:8]   # Hamilton w,x,y,z, I->G
    vel = data[:, 8:11]
    bg = data[:, 11:14]
    ba = data[:, 14:17]
    # Hamilton q_ItoG (w,x,y,z) → JPL q_GtoI (x,y,z,w): plain reorder, NO
    # conjugation — the two conventions share components for inverse frames
    # (reference DatasetReader::get_gt_state does the same plain reorder).
    q_jpl = np.stack([q_wxyz[:, 1], q_wxyz[:, 2], q_wxyz[:, 3], q_wxyz[:, 0]], axis=1)
    return t, pos, q_jpl, vel, bg, ba


class TimingRecorder:
    """Accumulates per-frame stage timings and writes the reference's CSV."""

    def __init__(self):
        self.rows: List[List[float]] = []

    def add(self, timestamp: float, stages: Dict[str, float]):
        row = [timestamp] + [stages.get(c, 0.0) for c in TIMING_COLUMNS[1:]]
        self.rows.append(row)

    def write(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("# " + ",".join(TIMING_COLUMNS) + "\n")
            for row in self.rows:
                f.write(",".join(f"{v:.9f}" for v in row) + "\n")

    def summary(self):
        """mean/std/99th/max per stage (timing_custom.cpp:74-125)."""
        arr = np.asarray(self.rows)
        out = {}
        for i, c in enumerate(TIMING_COLUMNS[1:], start=1):
            col = arr[:, i]
            out[c] = dict(
                mean=float(col.mean()), std=float(col.std()),
                p99=float(np.percentile(col, 99)), max=float(col.max()),
            )
        return out


class PlaneStatsRecorder:
    """Per-frame plane-tracking statistics CSV (the reference's second CSV:
    TrackPlane::get_tracking_info TrackPlane.cpp:387-461, written at
    VioManager.cpp:930-947). Columns are PLANE_TRACK_COLUMNS; the frontend
    supplies everything except `state planes` / `num constraint updates`,
    which the caller adds after the filter step."""

    def __init__(self):
        self.rows: List[List[float]] = []

    def add(self, timestamp: float, stats: Dict[str, float]):
        row = [timestamp] + [float(stats.get(c, 0.0)) for c in PLANE_TRACK_COLUMNS[1:]]
        self.rows.append(row)

    def write(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("# " + ",".join(PLANE_TRACK_COLUMNS) + "\n")
            for row in self.rows:
                f.write(",".join(f"{v:.9f}" for v in row) + "\n")
