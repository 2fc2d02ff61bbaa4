"""Trajectory sources for the simulator.

Two sources:

* :func:`load_trajectory_txt` reads the reference's simulated-trajectory
  format ``# timestamp(s) tx ty tz qx qy qz qw`` (data/udel_arl.txt:1,
  SURVEY.md Appendix B) so the reference datasets can be replayed when the
  files are available at runtime;
* :func:`room_scan_trajectory` procedurally generates a room-exploration
  path with the same character (smooth loops, varying height and yaw, ~0.5 m/s)
  for self-contained tests and benchmarks.
"""

from __future__ import annotations

import numpy as np


def load_trajectory_txt(path: str):
    """Load (times[N], pos[N,3], quat_GtoI[N,4] JPL xyzw). Mean-centers z like
    the reference simulator (Simulator.cpp:68-75)."""
    data = np.loadtxt(path, comments="#")
    # Rebase to t=0: recorded files carry absolute epochs (~1.55e9 s for
    # udel_arl), where float32 resolution is 128 s — any later cast of the
    # sim arrays to f32 for the TPU would collapse every timestamp and dt.
    # The simulator is self-contained, so only relative time matters.
    times = data[:, 0] - data[0, 0]
    pos = data[:, 1:4].copy()
    quat = data[:, 4:8].copy()
    pos[:, 2] -= pos[:, 2].mean()
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    return times, pos, quat


def room_scan_trajectory(duration: float = 60.0, hz: float = 100.0, seed: int = 0,
                         time_dilation: float = 1.0):
    """Smooth figure-eight room scan with height oscillation and tangent-facing yaw.

    Returns (times, pos, quat_GtoI) in the same convention as the txt loader.
    The pose looks along the direction of travel with a gentle pitch/roll sway
    so all IMU axes are excited (needed for calibration observability).
    time_dilation > 1 replays the same path at 1/dilation the speed (the
    slow close-range inspection regime, cf. the reference's AR-Table scenes).
    """
    if time_dilation != 1.0:
        times, pos, quat = room_scan_trajectory(duration / time_dilation,
                                                hz * time_dilation, seed)
        return times * time_dilation, pos, quat
    n = int(duration * hz) + 1
    t = np.arange(n) / hz
    # Lissajous-style loop inside a ~6x4 m room.
    wx, wy = 2 * np.pi / 17.0, 2 * np.pi / 9.5
    px = 2.5 * np.sin(wx * t) + 0.5 * np.sin(3.1 * wy * t) * 0.2
    py = 1.6 * np.sin(wy * t + 0.7)
    pz = 0.35 * np.sin(2 * np.pi * t / 7.3) + 0.1 * np.sin(2 * np.pi * t / 2.9)
    pos = np.stack([px, py, pz], axis=1)

    # Yaw follows velocity direction; add sway.
    vx = np.gradient(px, t)
    vy = np.gradient(py, t)
    yaw = np.unwrap(np.arctan2(vy, vx))
    pitch = 0.12 * np.sin(2 * np.pi * t / 5.1)
    roll = 0.10 * np.sin(2 * np.pi * t / 3.7 + 1.0)

    # R_GtoI = (R_z(yaw) R_y(pitch) R_x(roll))ᵀ  (body-to-global transposed).
    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    R_ItoG = np.zeros((n, 3, 3))
    R_ItoG[:, 0, 0] = cz * cy
    R_ItoG[:, 0, 1] = cz * sy * sx - sz * cx
    R_ItoG[:, 0, 2] = cz * sy * cx + sz * sx
    R_ItoG[:, 1, 0] = sz * cy
    R_ItoG[:, 1, 1] = sz * sy * sx + cz * cx
    R_ItoG[:, 1, 2] = sz * sy * cx - cz * sx
    R_ItoG[:, 2, 0] = -sy
    R_ItoG[:, 2, 1] = cy * sx
    R_ItoG[:, 2, 2] = cy * cx
    R_GtoI = R_ItoG.transpose(0, 2, 1)

    # Convert to JPL quats via the library op (vectorized, done in f64).
    import jax.numpy as jnp

    from ov_plane_tpu.ops.quat import rot_2_quat
    import jax

    quat = np.asarray(jax.vmap(rot_2_quat)(jnp.asarray(R_GtoI)))
    pos[:, 2] -= pos[:, 2].mean()
    return t, pos, quat


def corridor_trajectory(duration: float = 30.0, hz: float = 100.0):
    """Corridor walk: slow advance down a long hallway with an oscillating
    look-around (the camera sweeps wall → wall so the side planes are seen
    near-frontally, not at grazing angle). A differently-shaped world than
    the room scan: the traj bbox is elongated, so generate_planes builds a
    long narrow room — two big side walls + floor/ceiling strips.
    """
    n = int(duration * hz) + 1
    t = np.arange(n) / hz
    advance = 0.25 * duration                       # ~0.25 m/s walking pace
    px = advance * (t / duration) + 0.15 * np.sin(2 * np.pi * t / 6.3)
    py = 0.25 * np.sin(2 * np.pi * t / 8.7)
    pz = 0.08 * np.sin(2 * np.pi * t / 4.1)
    pos = np.stack([px, py, pz], axis=1)

    # Yaw sweeps 26°-80° off the corridor axis (a walking sideways-glance at
    # the left wall): looking straight DOWN the corridor puts both walls at
    # grazing angle and the (distant) end wall carries no resolvable texture
    # — measured to starve KLT and diverge the filter at the yaw≈0 crossing.
    # Gentle pitch/roll sway keeps all IMU axes excited.
    yaw = 0.93 + 0.47 * np.sin(2 * np.pi * t / 9.0)
    pitch = 0.10 * np.sin(2 * np.pi * t / 5.3)
    roll = 0.08 * np.sin(2 * np.pi * t / 3.9 + 0.8)

    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    R_ItoG = np.zeros((n, 3, 3))
    R_ItoG[:, 0, 0] = cz * cy
    R_ItoG[:, 0, 1] = cz * sy * sx - sz * cx
    R_ItoG[:, 0, 2] = cz * sy * cx + sz * sx
    R_ItoG[:, 1, 0] = sz * cy
    R_ItoG[:, 1, 1] = sz * sy * sx + cz * cx
    R_ItoG[:, 1, 2] = sz * sy * cx - cz * sx
    R_ItoG[:, 2, 0] = -sy
    R_ItoG[:, 2, 1] = cy * sx
    R_ItoG[:, 2, 2] = cy * cx
    R_GtoI = R_ItoG.transpose(0, 2, 1)

    import jax
    import jax.numpy as jnp

    from ov_plane_tpu.ops.quat import rot_2_quat

    quat = np.asarray(jax.vmap(rot_2_quat)(jnp.asarray(R_GtoI)))
    pos[:, 2] -= pos[:, 2].mean()
    return t, pos, quat


def tabletop_trajectory(duration: float = 25.0, hz: float = 100.0):
    """Table-top inspection orbit: the camera circles ~0.55 m from the scene
    center at ~0.5 m height, pitched ~50° down so the view is dominated by the
    horizontal surface below — the reference's AR-Table regime
    (ov_plane README table_01-08: handheld orbits over a textured table).

    Geometry rationale (second-scene validation under STOCK plane gates):
    the reference's plane-fit condition gate acts on RAW global coordinates
    (PlaneFitting.cpp:52-66, cond = σmax/σmin of the [N,3] point matrix), so
    it passes when the cluster's spread is comparable to its distance from
    the world origin. A look-down orbit centered on the origin gives
    |p_FinG| ≈ 0.3-0.8 m with ~0.5 m spread → cond ≈ 2-10, far under the
    stock 50 — unlike the room scan (walls 2-4 m out, cond 40-260) or the
    corridor. Close range also keeps triangulated-normal noise ~2°, inside
    the stock averaging gates.
    """
    n = int(duration * hz) + 1
    t = np.arange(n) / hz
    w_orb = 2 * np.pi / 11.0                        # one lap ≈ 11 s (~0.31 m/s)
    th = w_orb * t
    r = 0.55 + 0.05 * np.sin(2 * np.pi * t / 7.9)
    px = r * np.cos(th)
    py = r * np.sin(th)
    pz = 0.52 + 0.05 * np.sin(2 * np.pi * t / 5.7)
    pos = np.stack([px, py, pz], axis=1)

    # Face the orbit center (yaw = θ + π) and pitch down ~50° with a gentle
    # oscillation; small roll sway keeps all IMU axes excited.
    yaw = np.unwrap(th + np.pi)
    pitch = 0.88 + 0.10 * np.sin(2 * np.pi * t / 6.1)
    roll = 0.08 * np.sin(2 * np.pi * t / 4.3 + 0.6)

    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    R_ItoG = np.zeros((n, 3, 3))
    R_ItoG[:, 0, 0] = cz * cy
    R_ItoG[:, 0, 1] = cz * sy * sx - sz * cx
    R_ItoG[:, 0, 2] = cz * sy * cx + sz * sx
    R_ItoG[:, 1, 0] = sz * cy
    R_ItoG[:, 1, 1] = sz * sy * sx + cz * cx
    R_ItoG[:, 1, 2] = sz * sy * cx - cz * sx
    R_ItoG[:, 2, 0] = -sy
    R_ItoG[:, 2, 1] = cy * sx
    R_ItoG[:, 2, 2] = cy * cx
    R_GtoI = R_ItoG.transpose(0, 2, 1)

    import jax
    import jax.numpy as jnp

    from ov_plane_tpu.ops.quat import rot_2_quat

    quat = np.asarray(jax.vmap(rot_2_quat)(jnp.asarray(R_GtoI)))
    # NOTE: unlike the other procedural trajectories, z is NOT mean-centered:
    # the table surface must sit ~0.5 m BELOW the origin-centered orbit so the
    # raw-coordinate cluster stays near the origin (the cond-gate argument).
    return t, pos, quat


def get_trajectory(cfg_sim):
    """Resolve the configured trajectory source; fall back to the procedural
    room scan when the configured path is absent (reference configs point at
    repo-relative paths that may not exist here).

    Loaded trajectories are truncated to ``traj_duration`` seconds when that
    is positive (the reference replays full files; truncation keeps test and
    bench compile sizes bounded)."""
    import os

    if cfg_sim.traj_path and os.path.exists(cfg_sim.traj_path):
        times, pos, quat = load_trajectory_txt(cfg_sim.traj_path)
        start = float(getattr(cfg_sim, "traj_start", 0.0) or 0.0)
        if start > 0:
            keep = times >= times[0] + start
            if keep.sum() >= 8:
                times, pos, quat = times[keep], pos[keep], quat[keep]
        if cfg_sim.traj_duration and cfg_sim.traj_duration > 0:
            keep = times <= times[0] + cfg_sim.traj_duration
            if keep.sum() >= 8:
                times, pos, quat = times[keep], pos[keep], quat[keep]
        return times, pos, quat
    off = np.asarray(getattr(cfg_sim, "world_offset", (0.0, 0.0, 0.0)), float)
    if cfg_sim.traj_kind == "slow_scan":
        t, p, q = room_scan_trajectory(duration=cfg_sim.traj_duration, time_dilation=3.0)
    elif cfg_sim.traj_kind == "corridor":
        t, p, q = corridor_trajectory(duration=cfg_sim.traj_duration)
    elif cfg_sim.traj_kind == "tabletop":
        t, p, q = tabletop_trajectory(duration=cfg_sim.traj_duration)
    else:
        t, p, q = room_scan_trajectory(duration=cfg_sim.traj_duration)
    return t, p + off[None, :], q
