"""Per-feature stacked measurement Jacobians (batched, full-width).

Re-design of ``UpdaterHelper::get_feature_jacobian_full``
(update/UpdaterHelper.cpp:195-513) for GLOBAL_3D features: one feature
produces a fixed-shape stacked system over all K clone slots

    rows [0 : 2K)      whitened reprojection residuals (2 per clone slot)
    rows [2K : 3K)     whitened point-on-plane residuals (1 per observation,
                       active only when the feature is on a plane,
                       UpdaterHelper.cpp:448-512)

with Jacobians

    H_x: [3K, D]   full-width over the static state layout (clone blocks,
                   optional calib extrinsic/intrinsic columns, plane state
                   columns when the plane is in the state)
    H_f: [3K, 6]   columns 0:3 = d/d p_FinG; columns 3:6 = d/d cp (used only
                   when the plane is NOT a state — the MSCKF-plane path)

All rows carry a validity mask; masked rows are zero everywhere (mask-safe
for the QR/Kalman kernels, see ops/ekf.py). FEJ evaluation points follow the
reference exactly: clone fej poses + feature/plane fej values in the
Jacobians (UpdaterHelper.cpp:375-385,466-475), current estimates in the
residuals and the distortion Jacobian input (dz_dzn at the *current* uv_norm).

vmap over features for the batched updaters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops import cams
from ov_plane_tpu.ops.quat import quat_2_rot, skew
from ov_plane_tpu.state.layout import StateLayout


class JacobianOptions(NamedTuple):
    cam_model: int = cams.RADTAN
    do_fej: bool = True
    do_calib_camera_pose: bool = False
    do_calib_camera_intrinsics: bool = False
    # Landmark representation of the feature error state
    # (UpdaterHelper::get_feature_jacobian_representation, UpdaterHelper.cpp:35-193).
    # GLOBAL_3D keeps the legacy direct path; the other 3-dof reps chain the
    # reprojection rows through ops/representations.rep_jacobians and add the
    # anchor-clone coupling columns. ANCHORED_INVERSE_DEPTH_SINGLE (1-dof) is
    # not supported in the fixed 3-column H_f layout.
    rep: int = 0  # representations.GLOBAL_3D


class CloneSet(NamedTuple):
    """Per-frame gathered clone/cam data shared across features."""

    R_GtoI: jnp.ndarray      # [K, 3, 3] current estimates
    p_IinG: jnp.ndarray      # [K, 3]
    R_GtoI_fej: jnp.ndarray  # [K, 3, 3]
    p_IinG_fej: jnp.ndarray  # [K, 3]
    R_ItoC: jnp.ndarray      # [3, 3]
    p_IinC: jnp.ndarray      # [3]
    zeta: jnp.ndarray        # [8]

    @property
    def R_GtoC(self):
        return jnp.einsum("ab,kbc->kac", self.R_ItoC, self.R_GtoI)

    @property
    def p_CinG(self):
        # camera center: p_IinG − R_GtoIᵀ R_ItoCᵀ p_IinC
        return self.p_IinG - jnp.einsum("kab,b->ka", jnp.swapaxes(self.R_GtoI, -1, -2) @ self.R_ItoC.T[None], self.p_IinC)


def clone_set_from_state(state) -> CloneSet:
    R = jax.vmap(quat_2_rot)(state.clones_q)
    Rf = jax.vmap(quat_2_rot)(state.clones_q_fej)
    return CloneSet(
        R_GtoI=R, p_IinG=state.clones_p, R_GtoI_fej=Rf, p_IinG_fej=state.clones_p_fej,
        R_ItoC=quat_2_rot(state.calib_cam[0:4]), p_IinC=state.calib_cam[4:7],
        zeta=state.cam_zeta,
    )


@functools.partial(jax.jit, static_argnames=("lay", "opts"))
def feature_jacobian_full(
    lay: StateLayout,
    opts: JacobianOptions,
    clones: CloneSet,
    uv: jnp.ndarray,        # [K, 2] measured distorted pixels per clone slot
    obs_mask: jnp.ndarray,  # [K] bool
    p_FinG: jnp.ndarray,    # [3] current estimate
    p_FinG_fej: jnp.ndarray,
    cp: jnp.ndarray,        # [3] plane CP estimate (any value if no plane)
    cp_fej: jnp.ndarray,
    has_plane: jnp.ndarray,       # bool scalar
    plane_in_state: jnp.ndarray,  # bool scalar
    plane_slot: jnp.ndarray,      # int32 plane state slot index (0..P-1)
    sigma_px,
    sigma_c,
    anchor_slot: jnp.ndarray | int = 0,  # clone slot anchoring ANCHORED_* reps
):
    """Build one feature's stacked whitened system. Returns
    (H_x[3K, D], H_f[3K, 6], res[3K], row_mask[3K]).

    With ``opts.rep != GLOBAL_3D`` the feature columns H_f[:, 0:3] are the
    representation's error state (chained through rep_jacobians) and, for
    anchored reps, the anchor clone at ``anchor_slot`` receives the coupling
    columns d z/d(anchor pose) — UpdaterHelper.cpp:195-444's routing. Plane
    rows require GLOBAL_3D (the reference asserts this, VioManager.cpp:823).
    """
    from ov_plane_tpu.ops import representations as reps

    K = lay.max_clones
    D = lay.dim
    dtype = uv.dtype
    white_px = 1.0 / sigma_px
    white_c = 1.0 / sigma_c

    R_ItoC, p_IinC, zeta = clones.R_ItoC, clones.p_IinC, clones.zeta

    rj = None
    if opts.rep != reps.GLOBAL_3D:
        anchor_slot = jnp.asarray(anchor_slot)
        anc = reps.AnchorFrame(clones.R_GtoI[anchor_slot], clones.p_IinG[anchor_slot],
                               R_ItoC, p_IinC)
        anc_fej = reps.AnchorFrame(clones.R_GtoI_fej[anchor_slot],
                                   clones.p_IinG_fej[anchor_slot], R_ItoC, p_IinC)
        # Sanitize the linearization point for the rep transforms: a failed
        # triangulation can put the point at the frame origin or behind the
        # anchor camera, where inverse-depth params are NaN/Inf — and a NaN
        # survives the downstream 0-mask (0·NaN = NaN). Clamp to a unit
        # forward point in the anchor camera; such rows are masked anyway.
        def _safe_global(p_G, frame):
            p_A = frame.point_to_anchor(p_G)
            ok = jnp.isfinite(p_A).all() & (p_A[2] > 1e-3) & (jnp.linalg.norm(p_A) > 1e-3)
            p_A = jnp.where(ok, p_A, jnp.asarray([0.0, 0.0, 1.0], dtype))
            return frame.point_to_global(p_A)

        p_FinG = _safe_global(p_FinG, anc)
        p_FinG_fej = _safe_global(p_FinG_fej, anc_fej if opts.do_fej else anc)
        rj = reps.rep_jacobians(opts.rep, p_FinG, p_FinG_fej, anc, anc_fej,
                                fej=opts.do_fej,
                                calib_extrinsic=opts.do_calib_camera_pose)
        # FEJ overwrite (UpdaterHelper.cpp:376-385): linearize the projection
        # at the representation's re-anchored FEJ point.
        p_FinG_fej = rj.p_FinG

    # ---------------- reprojection block (vectorized over clones) ----------
    def per_clone(R_GtoIi, p_IiinG, R_fej, p_fej, uv_m, m):
        p_FinIi = R_GtoIi @ (p_FinG - p_IiinG)
        p_FinCi = R_ItoC @ p_FinIi + p_IinC
        z = jnp.where(jnp.abs(p_FinCi[2]) < 1e-6, 1e-6, p_FinCi[2])
        uv_norm = p_FinCi[:2] / z
        uv_dist, dz_dzn, dz_dzeta = cams.distort_jacobians(uv_norm, zeta, opts.cam_model)
        r = white_px * (uv_m - uv_dist)

        if opts.do_fej:
            R_j, p_j = R_fej, p_fej
            p_FinIi_j = R_j @ (p_FinG_fej - p_j)
        else:
            R_j, p_j = R_GtoIi, p_IiinG
            p_FinIi_j = p_FinIi
        p_FinCi_j = R_ItoC @ p_FinIi_j + p_IinC
        zj = jnp.where(jnp.abs(p_FinCi_j[2]) < 1e-6, 1e-6, p_FinCi_j[2])
        dzn_dpfc = jnp.array(
            [[1.0 / zj, 0.0, -p_FinCi_j[0] / zj**2], [0.0, 1.0 / zj, -p_FinCi_j[1] / zj**2]], dtype
        )
        dpfc_dpfg = R_ItoC @ R_j
        dz_dpfc = dz_dzn @ dzn_dpfc
        dz_dpfg = dz_dpfc @ dpfc_dpfg
        # clone block: [⌊p_FinIi⌋ via R_ItoC | −dpfc_dpfg]
        dpfc_dclone = jnp.concatenate([R_ItoC @ skew(p_FinIi_j), -dpfc_dpfg], axis=1)  # [3, 6]
        H_clone = white_px * dz_dpfc @ dpfc_dclone      # [2, 6]
        H_feat = white_px * dz_dpfg                      # [2, 3]
        H_calib = white_px * dz_dpfc @ jnp.concatenate([skew(p_FinCi_j - p_IinC), jnp.eye(3, dtype=dtype)], axis=1)
        H_zeta = white_px * dz_dzeta                     # [2, 8]
        mf = m.astype(dtype)
        return r * mf, H_clone * mf, H_feat * mf, H_calib * mf, H_zeta * mf

    r2, Hc, Hf2, Hcal, Hz = jax.vmap(per_clone)(
        clones.R_GtoI, clones.p_IinG, clones.R_GtoI_fej, clones.p_IinG_fej, uv, obs_mask
    )  # r2 [K,2], Hc [K,2,6], Hf2 [K,2,3], Hcal [K,2,6], Hz [K,2,8]

    # Representation chain rule: Hf2 is d z/d p_FinG; the feature error state
    # is d params, and anchored reps couple into the anchor clone + extrinsic.
    Hf_out = Hf2
    if rj is not None:
        Hf_out = Hf2 @ rj.H_f                               # [K, 2, 3]
        if reps.is_anchored(opts.rep):
            Ha_rows = (Hf2 @ rj.H_anchor).reshape(2 * K, 6)  # d z/d anchor pose
            if opts.do_calib_camera_pose:
                Hcal = Hcal + Hf2 @ rj.H_calib

    # Assemble reprojection rows into full-width H_x.
    H_x = jnp.zeros((3 * K, D), dtype)
    # Clone block-diagonal: [K,2,6] -> [2K, 6K].
    eyeK = jnp.eye(K, dtype=dtype)
    Hc_bd = jnp.einsum("kab,kl->kalb", Hc, eyeK).reshape(2 * K, 6 * K)
    H_x = H_x.at[: 2 * K, lay.clone_base : lay.clone_base + 6 * K].set(Hc_bd)
    if rj is not None and reps.is_anchored(opts.rep):
        # Scatter-add the anchor coupling at the anchor clone's columns.
        col = jnp.asarray(lay.clone_base + 6 * anchor_slot)
        z = jnp.zeros((), col.dtype)
        cur = jax.lax.dynamic_slice(H_x, (z, col), (2 * K, 6))
        H_x = jax.lax.dynamic_update_slice(H_x, cur + Ha_rows, (z, col))
    if opts.do_calib_camera_pose:
        H_x = H_x.at[: 2 * K, lay.cam_pose_idx : lay.cam_pose_idx + 6].set(Hcal.reshape(2 * K, 6))
    if opts.do_calib_camera_intrinsics:
        H_x = H_x.at[: 2 * K, lay.cam_intr_idx : lay.cam_intr_idx + 8].set(Hz.reshape(2 * K, 8))

    H_f = jnp.zeros((3 * K, 6), dtype)
    H_f = H_f.at[: 2 * K, 0:3].set(Hf_out.reshape(2 * K, 3))
    res = jnp.zeros((3 * K,), dtype).at[: 2 * K].set(r2.reshape(2 * K))
    row_mask = jnp.zeros((3 * K,), bool).at[: 2 * K].set(jnp.repeat(obs_mask, 2))

    # ---------------- point-on-plane rows (UpdaterHelper.cpp:448-512) ------
    d_cur = jnp.linalg.norm(cp)
    d_cur = jnp.where(d_cur < 1e-9, 1e-9, d_cur)
    n_cur = cp / d_cur
    r_plane = white_c * (0.0 - (n_cur @ p_FinG - d_cur))

    if opts.do_fej:
        pf_j = p_FinG_fej
        d_j = jnp.linalg.norm(cp_fej)
        d_j = jnp.where(d_j < 1e-9, 1e-9, d_j)
        n_j = cp_fej / d_j
    else:
        pf_j, d_j, n_j = p_FinG, d_cur, n_cur
    H_cp_row = white_c / d_j * (pf_j - (n_j @ pf_j) * n_j - d_j * n_j)  # [3]
    H_f_plane_row = white_c * n_j                                       # [3]

    plane_rows_mask = obs_mask & has_plane
    mrow = plane_rows_mask.astype(dtype)[:, None]
    res = res.at[2 * K :].set(r_plane * plane_rows_mask.astype(dtype))
    row_mask = row_mask.at[2 * K :].set(plane_rows_mask)
    H_f = H_f.at[2 * K :, 0:3].set(H_f_plane_row[None, :] * mrow)
    # Plane Jacobian: into the plane state's columns when in-state, else H_f[:,3:6].
    in_state = plane_in_state & has_plane
    H_f = H_f.at[2 * K :, 3:6].set(jnp.where(in_state, 0.0, H_cp_row[None, :] * mrow))
    col = lay.plane_base + 3 * plane_slot
    plane_block = jnp.where(in_state, H_cp_row[None, :] * mrow, 0.0)    # [K, 3]
    plane_scatter = jax.vmap(
        lambda v: jax.lax.dynamic_update_slice(jnp.zeros((D,), dtype), v, (col,))
    )(plane_block)
    H_x = H_x.at[2 * K :, :].set(plane_scatter)

    return H_x, H_f, res, row_mask
