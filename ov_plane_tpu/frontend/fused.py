"""One-dispatch vision step: the full frontend + filter frame in a single
jitted device program.

The unfused VisionPipeline interleaves ~25 separate device calls per frame
(preprocess, pyramid, gyro integration, LK prior, KLT, RANSAC, FAST,
undistorts, filter step) with host numpy between them. On a directly-attached
TPU each dispatch costs ~0.1 ms; through the axon remote tunnel each costs a
network round trip (~70 ms measured), putting the unfused path at 0.44
frames/s on the v5e — pure dispatch, zero compute (BASELINE.md round 3).

This module is the TPU-native form of ``track_image_and_update``
(VioManager.cpp:267-328): everything device-side — image preprocessing,
pyramid, gyro-seeded LK prior, KLT tracking, gyro 2-pt RANSAC, FAST top-up
with slot allocation, whole-track triangulation, observation emission, and
the full filter step — is ONE compiled program, called once per frame. The
host keeps exactly the work that is inherently sequential (SURVEY §7.3.4):
Delaunay plane detection and plane-id merging, fed by a small per-frame pull
(ids/uv/p3 ≈ 1 kB) and folded back in as per-id plane labels ONE FRAME LATER
— which is the reference's own dataflow: ``perform_plane_detection_monocular``
runs on the PREVIOUS image's tracks at the start of ``feed_monocular``
(TrackPlane.cpp:463-578, 580-1121).

Batched replay (many streams on one chip): ``jax.vmap`` of the same program
over a leading stream axis; the host runs B independent plane trackers on the
pulled batch. See ``FusedVisionDriver.step_batch``.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ov_plane_tpu.frontend import fast as ffast
from ov_plane_tpu.frontend import imageproc as ip
from ov_plane_tpu.frontend import klt as fklt
from ov_plane_tpu.frontend.ransac import RansacOptions, gyro_ransac, integrate_gyro
from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.manager import FrameData, VioEngine, step
from ov_plane_tpu.ops import cams
from ov_plane_tpu.ops.quat import quat_2_rot


class FusedVisionOptions(NamedTuple):
    """Static (hashable) knobs of the fused program."""

    cam_model: int
    h: int
    w: int
    cap: int                    # feature slot capacity (== max_obs_per_frame)
    num_target: int             # detection top-up target (num_pts + num_pts_plane)
    klt: fklt.KltOptions
    fast: ffast.FastOptions
    ransac: RansacOptions
    histogram_method: int
    merge_slots: int = 8
    # Whole-track triangulation gates (TrackPlane.cpp:668-680 + ray-RMS).
    feat_init_min_obs: int = 4
    min_dist: float = 0.25
    max_dist: float = 40.0
    max_cond: float = 5000.0
    max_ray_rms_rel: float = 0.05
    max_ray_rms_abs: float = 0.05
    # Image wire dtype for the host->device upload: 'f32' (lossless for float
    # sources), 'u8' (the camera-native format, 4x less transfer — see
    # _pack_inputs for when it is and is not safe), 'f16'.
    img_wire: str = "f32"


@struct.dataclass
class FusedFrontendState:
    """Device-resident tracker state (the FrontendState equivalent)."""

    pyr: fklt.PreparedPyramid      # previous frame's prepared pyramid
    ids: jnp.ndarray               # [cap] int32 (-1 free)
    uv: jnp.ndarray                # [cap, 2] f32 pixels
    valid: jnp.ndarray             # [cap] bool
    next_id: jnp.ndarray           # scalar int32
    tri_A: jnp.ndarray             # [cap, 3, 3] whole-track systems
    tri_b: jnp.ndarray             # [cap, 3]
    tri_c: jnp.ndarray             # [cap]
    tri_n: jnp.ndarray             # [cap] int32
    has_prev: jnp.ndarray          # scalar bool

    @classmethod
    def create(cls, vopts: FusedVisionOptions, first_id: int = 1) -> "FusedFrontendState":
        cap = vopts.cap
        zero_img = jnp.zeros((vopts.h, vopts.w), jnp.float32)
        pyr = fklt.prepare_pyramid(
            tuple(fklt.build_pyramid(zero_img, vopts.klt.levels)), vopts.klt.window)
        return cls(
            pyr=pyr,
            ids=jnp.full((cap,), -1, jnp.int32),
            uv=jnp.zeros((cap, 2), jnp.float32),
            valid=jnp.zeros((cap,), bool),
            next_id=jnp.asarray(first_id, jnp.int32),
            tri_A=jnp.zeros((cap, 3, 3), jnp.float32),
            tri_b=jnp.zeros((cap, 3), jnp.float32),
            tri_c=jnp.zeros((cap,), jnp.float32),
            tri_n=jnp.zeros((cap,), jnp.int32),
            has_prev=jnp.asarray(False),
        )


def _inv3(A, ridge):
    """Closed-form 3x3 inverse with a diagonal ridge (no LU — TPU-safe)."""
    A = A + ridge[..., None, None] * jnp.eye(3, dtype=A.dtype)
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c10 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c20 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c21 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _eigvals3_sym(A):
    """Closed-form eigenvalues of symmetric [...,3,3] (Smith's trigonometric
    method), descending. Avoids the eigh custom call — pure VPU math that
    vmaps/fuses like any elementwise op."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    A01, A02, A12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = A01**2 + A02**2 + A12**2
    dq0, dq1, dq2 = A[..., 0, 0] - q, A[..., 1, 1] - q, A[..., 2, 2] - q
    p2 = dq0**2 + dq1**2 + dq2**2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    Bm = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / p[..., None, None]
    detB = (Bm[..., 0, 0] * (Bm[..., 1, 1] * Bm[..., 2, 2] - Bm[..., 1, 2] * Bm[..., 2, 1])
            - Bm[..., 0, 1] * (Bm[..., 1, 0] * Bm[..., 2, 2] - Bm[..., 1, 2] * Bm[..., 2, 0])
            + Bm[..., 0, 2] * (Bm[..., 1, 0] * Bm[..., 2, 1] - Bm[..., 1, 1] * Bm[..., 2, 0]))
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # p2≈0: A is (near) a multiple of the identity.
    iso = p2 < 1e-24
    return (jnp.where(iso, q, e1), jnp.where(iso, q, e2), jnp.where(iso, q, e3))


def _solve_tracks(fev: FusedFrontendState, vopts: FusedVisionOptions, R_GtoC, p_CinG):
    """Device port of pipeline.solve_track_triangulations (same math+gates)."""
    enough = fev.valid & (fev.tri_n >= vopts.feat_init_min_obs)
    ridge = 1e-6 * (jnp.trace(fev.tri_A, axis1=-2, axis2=-1) + 1.0)
    ridge = ridge + jnp.where(enough, 0.0, 1.0)
    Ainv = _inv3(fev.tri_A, ridge)
    p3 = jnp.einsum("nij,nj->ni", Ainv, fev.tri_b)
    # tri_A is symmetric PSD: condition from closed-form eigenvalues.
    e1, _, e3 = _eigvals3_sym(fev.tri_A)
    cond = e1 / jnp.maximum(e3, 1e-18)
    depth = (p3 - p_CinG[None, :]) @ R_GtoC[2]
    quad = (jnp.einsum("ni,nij,nj->n", p3, fev.tri_A, p3)
            - 2.0 * jnp.einsum("ni,ni->n", p3, fev.tri_b) + fev.tri_c)
    ray_rms = jnp.sqrt(jnp.maximum(quad, 0.0) / jnp.maximum(fev.tri_n, 1))
    rms_gate = jnp.maximum(vopts.max_ray_rms_rel * jnp.abs(depth), vopts.max_ray_rms_abs)
    ok = (enough & (cond <= vopts.max_cond)
          & (depth >= vopts.min_dist) & (depth <= vopts.max_dist)
          & (ray_rms <= rms_gate)
          & jnp.all(jnp.isfinite(p3), axis=1))
    return p3, ok


@functools.partial(jax.jit, static_argnames=("eng", "vopts"))
def fused_vision_step(eng: VioEngine, vopts: FusedVisionOptions,
                      state, bank, fev: FusedFrontendState,
                      img, imu_t, imu_w, imu_a, t_new,
                      label_ids, label_pid, merge_from, merge_into):
    """One camera frame, one dispatch. All f32 frontend math; the filter step
    runs in the state's dtype.

    img [h, w] float in [0,1]; imu_* fixed windows covering [state.t, t_new];
    label_ids/label_pid [cap]: feature-id → plane-id labels from the HOST
    plane detector (previous frame — reference dataflow); merge_from/into [Q].

    Returns (state', bank', fev', out, pull) with pull = (ids, uv, valid,
    p3, ok3) for the host plane detector.
    """
    f32 = jnp.float32
    sdt = state.imu.dtype
    cap = vopts.cap

    # --- image → prepared pyramid ---------------------------------------
    img_j = ip.preprocess(img.astype(f32), vopts.histogram_method)
    pyr = fklt.prepare_pyramid(
        tuple(fklt.build_pyramid(img_j, vopts.klt.levels)), vopts.klt.window)

    # --- gyro-integrated inter-frame camera rotation ----------------------
    R_imu = integrate_gyro(imu_t.astype(f32), imu_w.astype(f32),
                           state.t.astype(f32), jnp.asarray(t_new, f32),
                           state.imu[10:13].astype(f32))
    R_ItoC = quat_2_rot(state.calib_cam[0:4]).astype(f32)
    p_IinC = state.calib_cam[4:7].astype(f32)
    R_cam = R_ItoC @ R_imu @ R_ItoC.T

    # --- previous camera pose (newest clone ≡ the previous image) ---------
    newest = state.newest_clone_slot
    have_clone = state.num_clones >= 1
    R_GtoI_pc = quat_2_rot(state.clones_q[newest]).astype(f32)
    p_I_pc = state.clones_p[newest].astype(f32)
    R_prevC = R_ItoC @ R_GtoI_pc
    p_prevC = p_I_pc - R_GtoI_pc.T @ (R_ItoC.T @ p_IinC)

    zeta = state.cam_zeta.astype(f32)
    und = jax.vmap(lambda uv: cams.undistort(uv, zeta, vopts.cam_model))

    # --- incremental whole-track triangulation (pre-track uv at prev pose) -
    uvn_prev = und(fev.uv)
    b_c = jnp.concatenate([uvn_prev, jnp.ones((cap, 1), f32)], axis=1)
    b_g = b_c @ R_prevC
    b_g = b_g / jnp.maximum(jnp.linalg.norm(b_g, axis=1, keepdims=True), 1e-18)
    Ai = jnp.eye(3, dtype=f32)[None] - b_g[:, :, None] * b_g[:, None, :]
    acc = (fev.valid & fev.has_prev & have_clone)
    accf = acc.astype(f32)
    tri_A = fev.tri_A + accf[:, None, None] * Ai
    tri_b = fev.tri_b + accf[:, None] * (Ai @ p_prevC)
    tri_c = fev.tri_c + accf * jnp.einsum("nij,i,j->n", Ai, p_prevC, p_prevC)
    tri_n = fev.tri_n + acc.astype(jnp.int32)
    fev = fev.replace(tri_A=tri_A, tri_b=tri_b, tri_c=tri_c, tri_n=tri_n)

    # --- predicted-pose LK flow prior (pipeline step 1 port) --------------
    R_GtoI_pi = quat_2_rot(state.imu[0:4]).astype(f32)
    R_GtoC_pi = R_ItoC @ R_GtoI_pi
    R_GtoC_new = R_cam @ R_GtoC_pi
    p_I_prev = state.imu[4:7].astype(f32)
    v_IinG = state.imu[7:10].astype(f32)
    dtf = jnp.maximum(jnp.asarray(t_new, f32) - state.t.astype(f32), 0.0)
    p_C_prev = p_I_prev - R_GtoC_pi.T @ p_IinC
    p_C_new = (p_I_prev + v_IinG * dtf) - R_GtoC_new.T @ p_IinC

    has_tri = fev.valid & (fev.tri_n >= 2)
    ridge = 1e-6 * (jnp.trace(fev.tri_A, axis1=-2, axis2=-1) + 1.0)
    ridge = ridge + jnp.where(has_tri, 0.0, 1.0)
    p3r = jnp.einsum("nij,nj->ni", _inv3(fev.tri_A, ridge), fev.tri_b)
    z = (p3r - p_C_prev[None, :]) @ R_GtoC_pi[2]
    good_d = has_tri & jnp.isfinite(z) & (z > vopts.min_dist) & (z < vopts.max_dist)
    # Masked median depth for young tracks.
    z_sorted = jnp.sort(jnp.where(good_d, z, jnp.inf))
    n_good = jnp.sum(good_d)
    med = z_sorted[jnp.clip((n_good - 1) // 2, 0, cap - 1)]
    med = jnp.where(n_good > 0, med, jnp.inf)
    depth = jnp.where(good_d, z, med)
    finite_d = jnp.isfinite(depth) & fev.valid
    pt_C_prev = b_c * jnp.where(finite_d, depth, 1.0)[:, None]
    pt_G = pt_C_prev @ R_GtoC_pi + p_C_prev
    pt_C_new = (pt_G - p_C_new) @ R_GtoC_new.T
    b_rot = b_c @ R_cam.T
    dir_new = jnp.where(finite_d[:, None], pt_C_new, b_rot)
    pred = jax.vmap(lambda p: cams.project(p, zeta, vopts.cam_model)[0])(dir_new)
    flow = pred - fev.uv
    good = (dir_new[:, 2] > 0.1) & jnp.all(jnp.isfinite(flow), axis=1)
    init_flow = jnp.where(good[:, None], flow, 0.0)

    # --- KLT + gyro RANSAC -------------------------------------------------
    track_mask = fev.valid & fev.has_prev
    p1, ok = fklt.track(fev.pyr, pyr, fev.uv, track_mask, vopts.klt, init_flow)
    uvn_cur = und(p1)
    inl, _, _ = gyro_ransac(uvn_prev, uvn_cur, ok, R_cam, vopts.ransac)
    ok = jnp.where(jnp.sum(ok) >= 8, ok & inl, ok)

    uv = jnp.where(ok[:, None], p1, fev.uv)
    valid = ok
    ids = jnp.where(valid, fev.ids, -1)

    # --- FAST top-up with in-program slot allocation -----------------------
    n_needed = jnp.clip(vopts.num_target - jnp.sum(valid), 0, cap)
    new_uv, new_ok = ffast.detect_grid(img_j, uv, valid, vopts.fast, vopts.h, vopts.w)
    free = ~valid
    free_rank = jnp.cumsum(free) - 1
    new_rank = jnp.cumsum(new_ok) - 1
    alloc = (free[:, None] & new_ok[None, :]
             & (free_rank[:, None] == new_rank[None, :])
             & (new_rank[None, :] < n_needed))
    is_new_row = jnp.any(alloc, axis=1)
    src = jnp.argmax(alloc, axis=1)
    uv = jnp.where(is_new_row[:, None], new_uv[src], uv)
    valid = valid | is_new_row
    ids = jnp.where(is_new_row, fev.next_id + free_rank.astype(jnp.int32), ids)
    n_new = jnp.sum(is_new_row).astype(jnp.int32)
    # Reset whole-track systems of re-allocated slots.
    rs = is_new_row
    fev = fev.replace(
        tri_A=jnp.where(rs[:, None, None], 0.0, fev.tri_A),
        tri_b=jnp.where(rs[:, None], 0.0, fev.tri_b),
        tri_c=jnp.where(rs, 0.0, fev.tri_c),
        tri_n=jnp.where(rs, 0, fev.tri_n),
    )

    # --- whole-track triangulation solve + gates (for the host detector) ---
    p3, ok3 = _solve_tracks(fev, vopts, R_prevC, p_prevC)
    p3 = jnp.where((ok3 & have_clone)[:, None], p3, 0.0)
    ok3 = ok3 & have_clone

    # --- plane labels from the host detector (previous frame, by id) ------
    leq = (ids[:, None] == label_ids[None, :]) & (label_ids >= 0)[None, :] & (ids >= 0)[:, None]
    has_l = jnp.any(leq, axis=1)
    pid = jnp.where(has_l, label_pid[jnp.argmax(leq, axis=1)], -1)

    # --- observation emission + filter step -------------------------------
    obs_id = jnp.where(valid, ids, -1)
    frame = FrameData(
        imu_t=imu_t.astype(sdt), imu_w=imu_w.astype(sdt), imu_a=imu_a.astype(sdt),
        t_new=jnp.asarray(t_new, sdt),
        obs_id=obs_id, obs_uv=uv.astype(sdt), obs_plane=pid,
        merge_from=merge_from, merge_into=merge_into,
    )
    new_state, new_bank, out = step(eng, state, bank, frame)

    fev = fev.replace(pyr=pyr, ids=ids, uv=uv, valid=valid,
                      next_id=fev.next_id + n_new, has_prev=jnp.asarray(True))
    # Host pull PACKED into one array: each device->host transfer costs a
    # full relay round trip (~30 ms measured through the axon tunnel), so the
    # per-frame host data — track table, triangulations, step counters,
    # debug counters — ships as ONE [cap+1, 8] f32 array (~2 kB, 1 RTT).
    rows = jnp.concatenate([
        ids[:, None].astype(jnp.float32),
        uv,
        valid[:, None].astype(jnp.float32),
        p3,
        ok3[:, None].astype(jnp.float32),
    ], axis=1)                                     # [cap, 8]
    counters = jnp.stack([
        out.n_plane_init.astype(jnp.float32),
        out.n_plane_constraints.astype(jnp.float32),
        out.n_planes.astype(jnp.float32),
        out.n_msckf_used.astype(jnp.float32),
        out.n_bank.astype(jnp.float32),
        jnp.sum(track_mask).astype(jnp.float32),
        jnp.sum(ok).astype(jnp.float32),
        jnp.sum(new_ok).astype(jnp.float32),
    ])
    # The host detector also needs the camera pose the triangulations were
    # solved at (R_prevC, p_prevC) — shipping it in the same pull saves the
    # driver 3-4 separate state pulls (~30 ms RTT each through the tunnel).
    # Slot 12 (first pad) carries the dropped-plane-group count (counter #8).
    pose_rows = jnp.concatenate([R_prevC.reshape(-1), p_prevC,
                                 out.n_plane_dropped.astype(f32)[None],
                                 jnp.zeros(3, f32)]).reshape(2, 8)
    pull = jnp.concatenate([rows, counters[None, :], pose_rows], axis=0)  # [cap+3, 8]
    return new_state, new_bank, fev, out, pull


def _pack_image(vopts: FusedVisionOptions, img):
    """Image → wire array (host side). The wire dtype is ``vopts.img_wire``:

    * ``'u8'`` — 4x less transfer than f32, which matters through the axon
      tunnel (a 32-stream f32 frame-batch is ~39 MB and measured ~1.3 s of the
      old single-upload step — the dominant cost, not compute). LOSSLESS when
      the source is an 8-bit camera (the reference ingests 8-bit mono,
      TrackPlane.cpp:463; EuRoC PNGs are u8) and measured ≤0.013 px track
      deviation on the textured bench scene. NOT for dim low-gradient float
      imagery: Scharr gradients of a quantized image are noise-amplified
      (measured: the sparse-blob test scene diverges under u8 and even f16).
    * ``'f16'`` — 2x; ~2.4e-4 absolute intensity error.
    * ``'f32'`` (default) — lossless for any float source.
    """
    imgs = np.asarray(img, np.float32)
    if vopts.img_wire == "u8":
        return np.clip(np.rint(imgs * 255.0), 0.0, 255.0).astype(np.uint8)
    if vopts.img_wire == "f16":
        return imgs.astype(np.float16)
    return imgs


def _pack_payload(vopts: FusedVisionOptions, W: int, B: int, imu_t, imu_w,
                  imu_a, t_new, label_ids, label_pid, merge_from, merge_into):
    """Non-image inputs → one small f32 payload array [B, n_pay] (host side).

    The payload (3 IMU windows, label/merge arrays, t_new — a few kB) stays
    f32 in a second small array; each extra transfer costs only a ~5 ms relay
    ack. Feature ids stay exact in f32 below 2^24.
    """
    cap, Q = vopts.cap, vopts.merge_slots
    n_pay = 7 * W + 2 * cap + 2 * Q + 1
    bview = lambda a: np.asarray(a, np.float32).reshape(B, -1)
    pay = np.zeros((B, n_pay), np.float32)
    pay[:, :W] = bview(imu_t)
    pay[:, W:4 * W] = bview(imu_w)
    pay[:, 4 * W:7 * W] = bview(imu_a)
    o = 7 * W
    pay[:, o:o + cap] = bview(label_ids)
    pay[:, o + cap:o + 2 * cap] = bview(label_pid)
    pay[:, o + 2 * cap:o + 2 * cap + Q] = bview(merge_from)
    pay[:, o + 2 * cap + Q:o + 2 * cap + 2 * Q] = bview(merge_into)
    pay[:, o + 2 * cap + 2 * Q] = np.asarray(t_new, np.float32).reshape(B)
    return pay


def _pack_inputs(vopts: FusedVisionOptions, W: int, img, imu_t, imu_w, imu_a,
                 t_new, label_ids, label_pid, merge_from, merge_into):
    """Pack one frame's inputs into (image on the wire, payload f32 [n_pay]).

    Two uploads per dispatch, sized for the wire (see _pack_image /
    _pack_payload for the dtype story)."""
    single = np.asarray(img).ndim == 2
    wire = _pack_image(vopts, np.asarray(img)[None] if single else img)
    B = wire.shape[0]
    pay = _pack_payload(vopts, W, B, imu_t, imu_w, imu_a, t_new,
                        label_ids, label_pid, merge_from, merge_into)
    return (wire[0], pay[0]) if single else (wire, pay)


def _unpack_inputs(vopts: FusedVisionOptions, W: int, img_wire, pay):
    """Device-side inverse of _pack_inputs for one stream."""
    cap, Q = vopts.cap, vopts.merge_slots
    if img_wire.dtype == jnp.uint8:
        img = img_wire.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    else:
        img = img_wire.astype(jnp.float32)
    imu_t = pay[:W]
    imu_w = pay[W:4 * W].reshape(W, 3)
    imu_a = pay[4 * W:7 * W].reshape(W, 3)
    o = 7 * W
    label_ids = pay[o:o + cap].astype(jnp.int32)
    label_pid = pay[o + cap:o + 2 * cap].astype(jnp.int32)
    merge_from = pay[o + 2 * cap:o + 2 * cap + Q].astype(jnp.int32)
    merge_into = pay[o + 2 * cap + Q:o + 2 * cap + 2 * Q].astype(jnp.int32)
    t_new = pay[o + 2 * cap + 2 * Q]
    return img, imu_t, imu_w, imu_a, t_new, label_ids, label_pid, merge_from, merge_into


def _unpack(packed: "np.ndarray"):
    """[B, cap+3, 8] packed pull →
    (ids, uv, valid, p3, ok3, counters, R_GtoC, p_CinG)."""
    rows, counters = packed[:, :-3], packed[:, -3]
    pose = packed[:, -2:].reshape(packed.shape[0], 16)
    R = pose[:, 0:9].reshape(-1, 3, 3).astype(np.float64)
    p = pose[:, 9:12].astype(np.float64)
    # Counter #8 (dropped plane groups) rides the pose-row padding.
    counters = np.concatenate([counters, pose[:, 12:13]], axis=1)
    ids = rows[..., 0].astype(np.int64)
    uv = rows[..., 1:3].astype(np.float64)
    valid = rows[..., 3] > 0.5
    p3 = rows[..., 4:7].astype(np.float64)
    ok3 = rows[..., 7] > 0.5
    return ids, uv, valid, p3, ok3, counters, R, p


class FusedVisionDriver:
    """Host driver for the fused program: holds the device frontend state,
    runs the (inherently sequential) Delaunay plane detector on the previous
    frame's pulled tracks, and feeds the resulting labels/merges into the next
    dispatch. One device round trip per frame per stream; `step_batch` vmaps
    the program over B independent streams (one chip, B sequences).

    mesh: optional `jax.sharding.Mesh` with a 'dp' axis — the stream batch is
    sharded over it (multi-chip vision serving: each device carries B/|dp|
    full frontend+filter streams; no cross-stream communication exists in the
    program, so the partitioning is embarrassingly clean). Requires batch to
    be a multiple of the axis size."""

    def __init__(self, cfg, eng: VioEngine, batch: int = 0, mesh=None,
                 chain: int = 1):
        from ov_plane_tpu.frontend.plane_track import PlaneTracker

        cap = cfg.tpu.max_obs_per_frame
        self.vopts = FusedVisionOptions(
            cam_model=cams.RADTAN if cfg.cam_model == "radtan" else cams.EQUI,
            h=cfg.cam_wh[1], w=cfg.cam_wh[0],
            cap=cap,
            num_target=min(cfg.num_pts + cfg.num_pts_plane, cap),
            # Reference LK geometry (TrackPlane.h:231-232): 15x15 window,
            # 5 levels; 8 prior-seeded iterations. Patch gathers are the
            # fused program's dominant device cost — the 21x21 window ran
            # 2.1x more gather volume than the reference's own setting.
            # Forward-only LK is the DEFAULT: it is the reference's own
            # dataflow (one calcOpticalFlowPyrLK call, TrackPlane.cpp:1329;
            # outliers go to the gyro RANSAC), halves the tracker's
            # sequential device chain (57.7 vs 63.4 ms/frame on the v5e), and
            # passes every fused quality gate incl. the stock-gate tabletop
            # plane e2e. OVP_KLT_FB=1 re-enables the forward-backward check.
            # Patch sampler 'mm': bilinear interpolation as one-hot matmuls
            # on the MXU (klt.py) — the vmapped dynamic_slice form serializes
            # into latency-bound gathers on the TPU. Measured on the v5e at
            # B=32 (track-alone, net of the tunnel RTT): slice ~158 ms, mm
            # (f32, exact ≡ slice to 1e-5 px) ~21 ms, mm_bf16 ~4.6 ms with
            # equal-or-better track survival. Default 'auto': mm_bf16 iff the
            # source image is 8-bit-representable (see wire_guard.py — bf16
            # patch rounding is then at/below the source's own quantization
            # floor; on float sources with sub-quantum signal the exact 'mm'
            # path is kept). Resolved against the first image.
            klt=fklt.KltOptions(
                levels=5, window=7, iters=8,
                fb_check=os.environ.get("OVP_KLT_FB", "0") == "1",
                sampler=os.environ.get("OVP_KLT_SAMPLER", "auto")),
            fast=ffast.FastOptions(
                threshold=cfg.fast_threshold / 255.0,
                grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                max_features=min(cfg.num_pts + cfg.num_pts_plane, cap),
            ),
            ransac=RansacOptions(),
            histogram_method={"NONE": ip.NONE, "HISTOGRAM": ip.HISTOGRAM,
                              "CLAHE": ip.CLAHE}.get(cfg.histogram_method.upper(), ip.NONE),
            feat_init_min_obs=cfg.trackplane.feat_init_min_obs,
            min_dist=cfg.trackplane.min_dist,
            max_dist=cfg.trackplane.max_dist,
            max_cond=cfg.trackplane.max_cond_number,
            max_ray_rms_rel=cfg.trackplane.max_ray_rms_rel,
            max_ray_rms_abs=cfg.trackplane.max_ray_rms_abs,
            # 'auto': u8 iff the source is already on the 8-bit lattice (the
            # wire is then bit-lossless — real cameras/EuRoC PNGs are u8);
            # f32 otherwise. Resolved against the first image (wire_guard.py).
            img_wire=os.environ.get("OVP_IMG_WIRE", "auto"),
        )
        self.eng = eng
        self.B = batch
        # Multi-process mesh: `batch` is the GLOBAL stream count (the vmap
        # axis); each process hosts only its local streams' plane trackers
        # and label/merge rows, ships its local slab of the payload/image,
        # and materializes only its addressable pull shards. Single-process
        # behavior (n_proc == 1) is unchanged.
        self._n_proc, self._pid = 1, 0
        if mesh is not None:
            self._n_proc = jax.process_count()
            self._pid = jax.process_index()
            if batch % max(self._n_proc, 1) != 0:
                raise ValueError(f"batch ({batch}) must divide across "
                                 f"{self._n_proc} processes")
        n = max(batch, 1) // self._n_proc
        self.trackers = [PlaneTracker(cfg.trackplane) for _ in range(n)]
        # The B per-stream plane detectors are independent (distinct
        # PlaneTracker instances, distinct label/merge rows), so they can run
        # on a thread pool: numpy and the ctypes Delaunay call release the
        # GIL, and at B=32 the serial loop (~2.8 ms/stream) is the largest
        # host cost once images are device-resident. OVP_PLANE_THREADS=N
        # opts in (0/1 = serial, the default).
        n_thr = int(os.environ.get("OVP_PLANE_THREADS", "0"))
        self._plane_pool = None
        if n_thr > 1 and n > 1:
            import concurrent.futures as _cf

            self._plane_pool = _cf.ThreadPoolExecutor(max_workers=n_thr)
        # Cross-stream batched detector (plane_track_batch.py): the default
        # for stream batches — one [B, ...] numpy pass replaces B sequential
        # update() calls (the GIL-bound ~2.5 ms/stream loop that was the
        # device-resident bench's throughput wall). OVP_PLANE_BATCH=0 keeps
        # the per-stream trackers (parity asserted in
        # tests/test_plane_track_batch.py either way).
        self.batch_tracker = None
        if n > 1 and os.environ.get("OVP_PLANE_BATCH", "1") != "0":
            from ov_plane_tpu.frontend.plane_track_batch import PlaneTrackerBatch

            self.batch_tracker = PlaneTrackerBatch(
                n, cfg.trackplane, capacity=max(128, 2 * cap),
                pool=self._plane_pool)
        cap_arr = self.vopts.cap
        self._label_ids = np.full((n, cap_arr), -1, np.int32)
        self._label_pid = np.full((n, cap_arr), -1, np.int32)
        Q = self.vopts.merge_slots
        self._merge_from = np.full((n, Q), -1, np.int32)
        self._merge_into = np.full((n, Q), -1, np.int32)
        self.last_plane_stats = [{} for _ in range(n)]
        self.last_tri = [None] * n
        # 'auto' wire/sampler resolve against the first image (wire_guard.py).
        self._guard_resolved = (self.vopts.img_wire != "auto"
                                and self.vopts.klt.sampler != "auto")
        self._guard_frame = 0
        self.wire_guard_info = None

        # Two wire-sized uploads per dispatch (see _pack_inputs): the step
        # takes (state, bank, fev, img_u8[h, w], payload[n_pay]) and unpacks
        # on device.
        self._W = cfg.tpu.max_imu_per_frame

        def _packed_step(st, bk, fe, img_u8, pay):
            (img, it, iw, ia, tn, li, lp, mf, mi) = _unpack_inputs(
                self.vopts, self._W, img_u8, pay)
            return fused_vision_step(eng, self.vopts, st, bk, fe, img, it, iw,
                                     ia, tn, li, lp, mf, mi)

        # K-frame chained dispatch: one jitted call advances K frames via
        # lax.scan over the SAME fused step (host plane labels stay constant
        # within the chunk, so the label lag grows from 2 to K+1 frames —
        # plane ids are stable across frames, same rationale as pipelining).
        # Purpose: a remote tunnel charges ~3 round trips per dispatch
        # (payload upload, invocation, pull); chaining divides that fixed
        # cost by K. chain=1 keeps the per-frame program unchanged.
        self.chain = max(int(chain), 1)

        def _packed_chain(st, bk, fe, imgs, pays):
            def body(carry, xs):
                st, bk, fe = carry
                img_u8, pay = xs
                st, bk, fe, out, pull = _packed_step(st, bk, fe, img_u8, pay)
                return (st, bk, fe), (out, pull)

            (st, bk, fe), (outs, pulls) = jax.lax.scan(body, (st, bk, fe),
                                                       (imgs, pays))
            return st, bk, fe, outs, pulls

        self._img_put_target = None
        if mesh is not None:
            if not batch or batch % mesh.shape["dp"] != 0:
                raise ValueError(
                    f"batch ({batch}) must be a positive multiple of the dp "
                    f"axis size ({mesh.shape['dp']})")
            ns = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
            self._img_put_target = ns
            self._fn = jax.jit(jax.vmap(_packed_step),
                               in_shardings=(ns, ns, ns, ns, ns),
                               out_shardings=ns)
        elif batch:
            self._fn = jax.jit(jax.vmap(_packed_step))
        else:
            self._fn = jax.jit(_packed_step)
        if self.chain > 1:
            if not batch or mesh is not None:
                raise ValueError("chain>1 needs batch mode without a mesh")
            # imgs [K, B, h, w] / pays [K, B, n_pay]: streams on the vmap
            # axis, frames on the scan axis.
            self._fn_chain = jax.jit(jax.vmap(
                _packed_chain, in_axes=(0, 0, 0, 1, 1), out_axes=(0, 0, 0, 1, 1)))

    # ------------------------------------------------------------------
    def _resolve_guard(self, img):
        """Resolve 'auto' wire/sampler against the first image and recheck
        u8-losslessness on a sampled cadence afterwards (wire_guard.py: the
        quantized fast modes are taken only when quantization is exactly
        lossless — the source already lives on the 8-bit lattice).

        A mid-stream regime flip (a frame off the lattice while wire='u8')
        downgrades the wire to f32 for subsequent frames with a warning; the
        input-dtype change just retraces the same program."""
        from ov_plane_tpu.frontend import wire_guard as wg

        if isinstance(img, jax.Array):      # pre-staged: already resolved
            return
        vo = self.vopts
        if not self._guard_resolved:
            wire, sampler, info = wg.resolve_wire_and_sampler(
                img, vo.img_wire, vo.klt.sampler)
            self.vopts = vo._replace(img_wire=wire,
                                     klt=vo.klt._replace(sampler=sampler))
            self.wire_guard_info = info
            self._guard_resolved = True
            if info["reason"] is not None:
                print(f"[fused] wire guard: wire={wire} sampler={sampler} "
                      f"({info['reason']})")
            return
        # Sampled recheck: representability is a property of the data
        # pipeline, not scene content, so a cheap every-16th-frame check
        # catches a source switch without taxing the per-frame path.
        self._guard_frame += 1
        if (self.vopts.img_wire == "u8" and self._guard_frame % 16 == 0
                and not wg.u8_representable(img)):
            print("[fused] wire guard: frame left the 8-bit lattice — "
                  "downgrading wire u8 -> f32 (this frame shipped quantized)")
            self.vopts = self.vopts._replace(img_wire="f32")
            self.wire_guard_info = dict(self.wire_guard_info or {},
                                        wire="f32", downgraded=True)

    def _put_dp(self, x):
        """Host array → device array under the driver's sharding regime:
        plain put (no mesh), dp-sharded put (single-process mesh), or
        local-slab assembly into a global array (multi-process mesh — `x` is
        this process's local leading-axis slab)."""
        if self._img_put_target is None:
            return jnp.asarray(x)
        if self._n_proc == 1:
            return jax.device_put(x, self._img_put_target)
        return jax.make_array_from_process_local_data(self._img_put_target, x)

    def _materialize_pull(self, pull) -> "np.ndarray":
        """Device pull → this process's host rows (all rows single-process;
        the addressable dp shards, in global order, multi-process)."""
        if self._n_proc == 1:
            return np.asarray(pull)
        shards = sorted(pull.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def stage_image(self, img) -> jax.Array:
        """Pack ``img`` to the wire dtype and start its host→device transfer
        NOW (``jax.device_put`` is asynchronous); pass the returned device
        array to ``step_stream``/``step_batch`` in place of the raw image.

        The image is the wire-dominant input (a 32-stream u8 frame-batch is
        ~10 MB ≈ 330 ms through the axon tunnel vs a few kB of payload), so
        staging frame k+1 while frame k computes — from the replay loop or a
        ``parallel.ingest.Prefetcher`` thread — takes both the u8 quantization
        pass and the upload off the per-frame critical path.

        Under a multi-process mesh, pass this process's LOCAL stream slab."""
        self._resolve_guard(img)
        wire = _pack_image(self.vopts, img)
        if self._img_put_target is not None:
            return self._put_dp(wire)
        return jax.device_put(wire)

    def stage_chunk(self, imgs) -> jax.Array:
        """Pack a K-frame chunk ``imgs`` [K, B, h, w] to the wire dtype and
        start its upload now (the chain-mode analogue of stage_image)."""
        self._resolve_guard(imgs[0])
        wire = np.stack([_pack_image(self.vopts, im) for im in imgs])
        return jax.device_put(wire)

    def _wire_image(self, img) -> jax.Array:
        if isinstance(img, jax.Array):
            return img                      # pre-staged by stage_image
        self._resolve_guard(img)
        wire = _pack_image(self.vopts, img)
        if self._img_put_target is not None:
            return self._put_dp(wire)
        return jnp.asarray(wire)

    def init_frontend(self, first_id: int = 1) -> FusedFrontendState:
        return FusedFrontendState.create(self.vopts, first_id)

    # ------------------------------------------------------------------
    def _apply_plane_result(self, s: int, f2p, p2o, timing, total):
        """Fold one stream's detector output into the label/merge arrays for
        the NEXT dispatch + the per-stream stats surface."""
        self._label_ids[s] = -1
        self._label_pid[s] = -1
        items = list(f2p.items())[: self._label_ids.shape[1]]
        for k, (fid, pid) in enumerate(items):
            self._label_ids[s, k] = fid
            self._label_pid[s, k] = pid
        Q = self._merge_from.shape[1]
        self._merge_from[s] = -1
        self._merge_into[s] = -1
        k = 0
        for into, olds in p2o.items():
            for old in olds:
                if k < Q:
                    self._merge_from[s, k] = old
                    self._merge_into[s, k] = into
                    k += 1
        n_pl = len(set(f2p.values()))
        self.last_plane_stats[s] = {
            "feat/plane": (len(f2p) / n_pl) if n_pl else 0.0,
            "num plane": float(n_pl),
            "num constraint updates": float(len(f2p)),
            "delaunay": timing.get("delaunay", 0.0),
            "matching": timing.get("matching", 0.0),
            "total": total,
        }

    def _host_plane_update(self, s: int, ids, uv, valid, p3, ok3):
        """Run the Delaunay detector for stream s on the pulled tracks and
        refresh its label/merge arrays for the NEXT dispatch."""
        tr = self.trackers[s]
        ids = np.where(valid, ids, -1)
        self.last_tri[s] = (ids, uv, p3, ok3 & valid)
        import time as _t

        t0 = _t.perf_counter()
        f2p, p2o = tr.update(ids, uv, p3, ok3 & valid, self._R_GtoC[s], self._p_CinG[s])
        self._apply_plane_result(s, f2p, p2o, tr.last_timing,
                                 _t.perf_counter() - t0)

    # ------------------------------------------------------------------
    def step_stream(self, state, bank, fev, img, imu_t, imu_w, imu_a, t_new,
                    pipelined: bool = True):
        """Single stream: one dispatch + host plane detection.

        pipelined=True (default) overlaps frame k's device→host pull with
        frame k+1's device execution: the dispatch returns immediately (JAX
        async), the PREVIOUS frame's pull is materialized while the device
        runs, and its plane labels feed the NEXT dispatch. Labels then lag by
        TWO frames instead of the reference's one (TrackPlane detects on the
        previous image) — plane ids are stable across frames, and the ~30 ms
        tunnel RTT comes off the critical path entirely.
        pipelined=False reproduces the 1-frame-lag synchronous dataflow.
        """
        import time as _t

        t0 = _t.perf_counter()
        img_w = self._wire_image(img)
        pay = _pack_payload(
            self.vopts, self._W, 1, imu_t, imu_w, imu_a, t_new,
            self._label_ids[0], self._label_pid[0],
            self._merge_from[0], self._merge_into[0])[0]
        state, bank, fev, out, pull = self._fn(
            state, bank, fev, img_w, jnp.asarray(pay))
        if pipelined:
            prev = self._pending_pull if hasattr(self, "_pending_pull") else None
            self._pending_pull = pull                 # materialized next step
            if prev is None:
                self.last_times = {"device": _t.perf_counter() - t0, "host_plane": 0.0}
                self.last_counters = np.zeros((1, 9), np.float32)
                self.last_dbg = self.last_counters[0, 5:8]
                return state, bank, fev, out
            pull = prev
        packed = np.asarray(pull)                      # ONE transfer
        t1 = _t.perf_counter()
        (ids, uv, valid, p3, ok3, self.last_counters,
         self._R_GtoC, self._p_CinG) = _unpack(packed[None])
        self.last_dbg = self.last_counters[0, 5:8]
        self._host_plane_update(0, ids[0], uv[0], valid[0], p3[0], ok3[0])
        self.last_times = {"device": t1 - t0, "host_plane": _t.perf_counter() - t1}
        return state, bank, fev, out

    def flush_stream(self, pipelined_tail: bool = True):
        """Drain the pipelined pull after the last step_stream/step_batch call
        so the final frame's plane detection + counters are still processed."""
        pull = getattr(self, "_pending_pull", None)
        if pull is None:
            return
        self._pending_pull = None
        packed = self._materialize_pull(pull)
        if packed.ndim == 2:
            packed = packed[None]
        if packed.ndim == 4:                  # chunked [K, B, cap+3, 8]
            for k in range(packed.shape[0]):
                (ids, uv, valid, p3, ok3, self.last_counters,
                 self._R_GtoC, self._p_CinG) = _unpack(packed[k])
                if pipelined_tail:
                    self._run_plane_detectors(ids, uv, valid, p3, ok3)
            return
        (ids, uv, valid, p3, ok3, self.last_counters,
         self._R_GtoC, self._p_CinG) = _unpack(packed)
        if pipelined_tail:
            for s in range(ids.shape[0]):
                self._host_plane_update(s, ids[s], uv[s], valid[s], p3[s], ok3[s])

    def step_batch(self, states, banks, fevs, imgs, imu_t, imu_w, imu_a, t_new,
                   pipelined: bool = True):
        """B streams, one vmapped dispatch. All array args carry a leading
        [B] axis; the host runs B plane detectors on the pulled batch.
        pipelined: same pull/dispatch overlap as step_stream (labels lag by
        two frames; the tunnel RTT leaves the critical path)."""
        import time as _t

        t0 = _t.perf_counter()
        img_w = self._wire_image(imgs)
        t_img = _t.perf_counter()
        # Payload rows are this process's LOCAL streams (== all streams when
        # single-process); imu_*/t_new carry the same local slab.
        pay = _pack_payload(
            self.vopts, self._W, self._label_ids.shape[0], imu_t, imu_w, imu_a,
            t_new, self._label_ids, self._label_pid, self._merge_from,
            self._merge_into)
        t_pack = _t.perf_counter()
        pay_g = self._put_dp(pay) if self._img_put_target is not None else jnp.asarray(pay)
        t_put = _t.perf_counter()
        states, banks, fevs, out, pull = self._fn(
            states, banks, fevs, img_w, pay_g)
        t_fn = _t.perf_counter()
        if pipelined:
            prev = getattr(self, "_pending_pull", None)
            self._pending_pull = pull
            if prev is None:
                self.last_times = {"device": _t.perf_counter() - t0, "host_plane": 0.0}
                self.last_counters = np.zeros((self._label_ids.shape[0], 9), np.float32)
                self.last_dbg = self.last_counters[0, 5:8]
                return states, banks, fevs, out
            pull = prev
        packed = self._materialize_pull(pull)          # ONE transfer
        t1 = _t.perf_counter()
        (ids, uv, valid, p3, ok3, self.last_counters,
         self._R_GtoC, self._p_CinG) = _unpack(packed)
        t_unpack = _t.perf_counter()
        self._run_plane_detectors(ids, uv, valid, p3, ok3)
        t_det = _t.perf_counter()
        self.last_dbg = self.last_counters[0, 5:8]
        # Fine decomposition of the dispatch window (VERDICT r4 #3): where a
        # headline frame-batch's wall actually goes. `dispatch_enqueue` is
        # _fn's synchronous cost (tracing is cached; a long time here = the
        # runtime applying BACKPRESSURE — blocking the enqueue until earlier
        # dispatches drain, i.e. real device execution); `pull_wait` blocks on
        # the PREVIOUS frame's device completion + device→host transfer.
        self.last_times = {
            "device": t1 - t0, "host_plane": t_det - t1,
            "wire_image": t_img - t0, "pack_payload": t_pack - t_img,
            "payload_put": t_put - t_pack, "dispatch_enqueue": t_fn - t_put,
            "pull_wait": t1 - t_fn, "unpack": t_unpack - t1,
        }
        return states, banks, fevs, out

    def step_batch_chunk(self, states, banks, fevs, imgs, imu_t, imu_w, imu_a,
                         t_new, pipelined: bool = True):
        """K frames x B streams, ONE dispatch (requires chain=K at
        construction). imgs: [K, B, h, w] (or pre-staged via stage_chunk);
        imu_t [K, B, W]; imu_w/imu_a [K, B, W, 3]; t_new [K, B].

        Host plane labels are constant within the chunk and refresh from the
        chunk's pulled per-frame track tables before the next dispatch (the
        detector still runs once per frame per stream, in frame order)."""
        import time as _t

        K = self.chain
        t0 = _t.perf_counter()
        if isinstance(imgs, jax.Array):
            img_w = imgs
        else:
            self._resolve_guard(np.asarray(imgs[0]))
            img_w = jnp.asarray(np.stack(
                [_pack_image(self.vopts, im) for im in np.asarray(imgs)]))
        B = self._label_ids.shape[0]
        pays = np.stack([
            _pack_payload(self.vopts, self._W, B, imu_t[k], imu_w[k], imu_a[k],
                          t_new[k], self._label_ids, self._label_pid,
                          self._merge_from, self._merge_into)
            for k in range(K)])
        states, banks, fevs, outs, pulls = self._fn_chain(
            states, banks, fevs, img_w, jnp.asarray(pays))
        if pipelined:
            prev = getattr(self, "_pending_pull", None)
            self._pending_pull = pulls
            if prev is None:
                self.last_times = {"device": _t.perf_counter() - t0, "host_plane": 0.0}
                self.last_counters = np.zeros((B, 9), np.float32)
                self.last_dbg = self.last_counters[0, 5:8]
                return states, banks, fevs, outs
            pulls = prev
        packed = np.asarray(pulls)                     # ONE transfer [K,B,cap+3,8]
        t1 = _t.perf_counter()
        counters_sum = None
        for k in range(packed.shape[0]):
            (ids, uv, valid, p3, ok3, self.last_counters,
             self._R_GtoC, self._p_CinG) = _unpack(packed[k])
            self._run_plane_detectors(ids, uv, valid, p3, ok3)
            if counters_sum is None:
                counters_sum = self.last_counters.copy()
            else:
                cs = counters_sum + self.last_counters
                # Gauges (n_planes #2, n_bank #4, track counts #5-7) take the
                # chunk max; event counts (#0, #1, #3, #8) accumulate.
                for g in (2, 4, 5, 6, 7):
                    cs[:, g] = np.maximum(counters_sum[:, g],
                                          self.last_counters[:, g])
                counters_sum = cs
        self.last_counters = counters_sum
        self.last_dbg = self.last_counters[0, 5:8]
        self.last_times = {"device": t1 - t0, "host_plane": _t.perf_counter() - t1}
        return states, banks, fevs, outs

    def _run_plane_detectors(self, ids, uv, valid, p3, ok3):
        B = ids.shape[0]
        if self.batch_tracker is not None:
            import time as _t

            t0 = _t.perf_counter()
            idsm = np.where(valid, ids, -1)
            ok = ok3 & valid
            results = self.batch_tracker.update_batch(
                idsm, uv, p3, ok, self._R_GtoC, self._p_CinG)
            per_s = (_t.perf_counter() - t0) / B
            tl = self.batch_tracker.last_timing
            timing = {"delaunay": tl.get("delaunay", 0.0) / B,
                      "matching": tl.get("matching", 0.0) / B}
            for s in range(B):
                self.last_tri[s] = (idsm[s], uv[s], p3[s], ok[s])
                f2p, p2o = results[s]
                self._apply_plane_result(s, f2p, p2o, timing, per_s)
            return
        if self._plane_pool is not None:
            list(self._plane_pool.map(
                lambda s: self._host_plane_update(
                    s, ids[s], uv[s], valid[s], p3[s], ok3[s]), range(B)))
        else:
            for s in range(B):
                self._host_plane_update(s, ids[s], uv[s], valid[s], p3[s], ok3[s])
