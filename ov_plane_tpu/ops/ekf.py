"""EKF covariance-level kernels on the static state layout.

Functional, full-matrix redesign of the reference's ``StateHelper`` ops
(state/StateHelper.cpp): EKFPropagation (:41), EKFUpdate (:121), clone (:346),
marginalize (:276), initialize (:398), initialize_invertible (:489),
augment_clone (:588). Key translation decisions (SURVEY.md §7.1):

* the reference's (H_order, per-variable id) bookkeeping disappears: Jacobians
  are built *full-width* over the static layout ``[M, D]`` (D ≈ 200-300), so
  placement is a compile-time index, and a zero column simply contributes
  nothing;
* masked (padding) measurement rows are all-zero rows of H with zero residual
  and unit noise — they provably leave the Kalman gain, covariance, chi2, and
  QR factors untouched, so one static shape serves any live measurement count;
* the sequential Givens chains become (batched) Householder QR;
* marginalization = zeroing a slot's rows/columns (slot recycling) instead of
  shrinking the matrix.

All functions are pure and jit/vmap-safe; dtype follows the inputs (f64 by
default — TPU handles the small [D, D] f64 math fine, the batch dimensions
carry the parallelism).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from ov_plane_tpu.ops.quat import quat_multiply, quat_norm
from ov_plane_tpu.state.vio_state import VioState


# ---------------------------------------------------------------------------
# Propagation / cloning / marginalization
# ---------------------------------------------------------------------------

@jax.jit
def propagate_cov(cov: jnp.ndarray, phi: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """Propagate the [0:15] IMU block: P ← Φ P Φᵀ + Q on the IMU rows/cols.

    Equivalent to StateHelper::EKFPropagation (StateHelper.cpp:41-119) with
    order_NEW = order_OLD = [imu].
    """
    n = phi.shape[0]
    cov_phiT = cov[:, :n] @ phi.T                      # [D, 15]
    phi_cov_phiT = phi @ cov_phiT[:n, :] + qd           # [15, 15]
    cov = cov.at[:n, :].set(cov_phiT.T)
    cov = cov.at[:, :n].set(cov_phiT)
    cov = cov.at[:n, :n].set(0.5 * (phi_cov_phiT + phi_cov_phiT.T))
    return cov


def _index_mask(dim: int, start, size: int, dtype=jnp.float64):
    """[D] mask that is 0 on [start, start+size) and 1 elsewhere. start may be traced."""
    idx = jnp.arange(dim)
    return jnp.where((idx >= start) & (idx < start + size), 0.0, 1.0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def zero_slot(cov: jnp.ndarray, start, size: int) -> jnp.ndarray:
    """Marginalize a slot: zero its rows and columns (StateHelper::marginalize,
    StateHelper.cpp:276-344 — except the layout is static so we zero instead of shrink)."""
    keep = _index_mask(cov.shape[0], start, size, cov.dtype)
    return cov * keep[None, :] * keep[:, None]


@functools.partial(jax.jit, static_argnames=("src", "size"))
def clone_block(cov: jnp.ndarray, src: int, dst, size: int) -> jnp.ndarray:
    """Stochastic cloning: copy rows/cols of [src, src+size) into slot dst
    (StateHelper::clone, StateHelper.cpp:346-396). dst may be traced; the dst
    slot must be zero (marginalized) beforehand."""
    dst = jnp.asarray(dst)
    z = jnp.zeros((), dst.dtype)
    col = jax.lax.dynamic_slice(cov, (0, src), (cov.shape[0], size))       # [D, size]
    blk = jax.lax.dynamic_slice(cov, (src, src), (size, size))             # [size, size]
    cov = jax.lax.dynamic_update_slice(cov, col, (z, dst))
    cov = jax.lax.dynamic_update_slice(cov, col.T, (dst, z))
    cov = jax.lax.dynamic_update_slice(cov, blk, (dst, dst))
    return cov


@functools.partial(jax.jit, static_argnames=("dt_idx",))
def augment_clone_timeoffset(cov: jnp.ndarray, dst, dnc_dt: jnp.ndarray, dt_idx: int) -> jnp.ndarray:
    """Add the time-offset Jacobian coupling for a fresh clone
    (StateHelper::augment_clone, StateHelper.cpp:613-624): the new clone pose
    is a function of the camera-IMU time offset with d(clone)/d(dt) = dnc_dt[6]."""
    d = cov.shape[0]
    dst = jnp.asarray(dst)
    z = jnp.zeros((), dst.dtype)
    cov_dt_col = jax.lax.dynamic_slice(cov, (0, dt_idx), (d, 1))           # [D, 1]
    add = cov_dt_col @ dnc_dt[None, :]                                      # [D, 6]
    cur_cols = jax.lax.dynamic_slice(cov, (z, dst), (d, 6))
    cov = jax.lax.dynamic_update_slice(cov, cur_cols + add, (z, dst))
    # Second (row) add must use the UPDATED dt row — the first add wrote
    # P_dt,dt·dncᵀ into its clone columns, which yields the quadratic term
    # dnc·P_dt,dt·dncᵀ in the clone's own block; snapshotting the original dt
    # column instead leaves the covariance indefinite (the reference's
    # in-place Eigen adds get this implicitly, StateHelper.cpp:620-623).
    row_dt = jax.lax.dynamic_slice(cov, (dt_idx, 0), (1, d))               # [1, D] updated
    add_rows = dnc_dt[:, None] @ row_dt                                     # [6, D]
    cur_rows = jax.lax.dynamic_slice(cov, (dst, z), (6, d))
    cov = jax.lax.dynamic_update_slice(cov, cur_rows + add_rows, (dst, z))
    return cov


# ---------------------------------------------------------------------------
# Update
# ---------------------------------------------------------------------------

@jax.jit
def kalman_update(cov: jnp.ndarray, H: jnp.ndarray, res: jnp.ndarray, r_diag: jnp.ndarray):
    """Standard EKF update with full-width H (StateHelper::EKFUpdate,
    StateHelper.cpp:121-202), in square-root form.

    With L = chol(S), W = L⁻¹ (H P), u = L⁻¹ res:
        P'  = P − P Hᵀ S⁻¹ H P = P − Wᵀ W     (symmetric by construction)
        dx  = P Hᵀ S⁻¹ res     = Wᵀ u
        χ²  = resᵀ S⁻¹ res     = uᵀ u
    One triangular solve + one rank-M SYRK instead of cho_solve's two solves
    plus an explicit K·(HP)ᵀ — fewer FLOPs, and the downdate is exactly
    symmetric (no post-hoc 0.5(A+Aᵀ)), keeping P PSD to rounding.

    Masked rows must have H-row = 0, res = 0, r_diag = 1.
    Returns (dx[D], new_cov, chi2) where chi2 = resᵀ S⁻¹ res (full stacked
    residual — per-path gates slice their own).
    """
    from jax.scipy.linalg import solve_triangular

    from ov_plane_tpu.ops.pallas_kernels import kalman_downdate

    Ma = cov @ H.T                                    # P Hᵀ : [D, M]
    S = H @ Ma + jnp.diag(r_diag)                     # [M, M]
    S = 0.5 * (S + S.T)
    L = jnp.linalg.cholesky(S)                        # lower
    W = solve_triangular(L, Ma.T, lower=True)         # L⁻¹ (H P) : [M, D]
    u = solve_triangular(L, res, lower=True)          # [M]
    # Fused rank-M downdate + correction (one read of W) — Pallas on TPU,
    # plain XLA elsewhere.
    new_cov, dx = kalman_downdate(cov, W, u)
    chi2 = u @ u
    return dx, new_cov, chi2


@jax.jit
def innovation_chi2(cov: jnp.ndarray, H: jnp.ndarray, res: jnp.ndarray, r_diag: jnp.ndarray):
    """resᵀ (H P Hᵀ + R)⁻¹ res without forming the update (gating only)."""
    S = H @ (cov @ H.T) + jnp.diag(r_diag)
    S = 0.5 * (S + S.T)
    return res @ cho_solve(cho_factor(S, lower=True), res)


@jax.jit
def apply_dx(state: VioState, dx: jnp.ndarray) -> VioState:
    """Box-plus the error-state correction onto all state variables.

    JPL pose update (ov_type PoseJPL::update): q ← quat([δθ/2, 1]) ⊗ q,
    p ← p + δp. Vector states add. FEJ values are untouched (first-estimate
    Jacobian semantics). Inactive slots receive zero dx (their covariance is
    zero ⇒ zero gain), so no masking is needed.
    """
    lay = state.layout
    dt = dx.dtype

    def quat_boxplus(q, dth):
        dq = quat_norm(jnp.concatenate([0.5 * dth, jnp.ones_like(dth[..., :1])], axis=-1))
        return quat_multiply(dq, q)

    imu_q = quat_boxplus(state.imu[0:4], dx[lay.IMU_TH:lay.IMU_TH + 3])
    imu_p = state.imu[4:7] + dx[lay.IMU_P:lay.IMU_P + 3]
    imu_v = state.imu[7:10] + dx[lay.IMU_V:lay.IMU_V + 3]
    imu_bg = state.imu[10:13] + dx[lay.IMU_BG:lay.IMU_BG + 3]
    imu_ba = state.imu[13:16] + dx[lay.IMU_BA:lay.IMU_BA + 3]
    imu = jnp.concatenate([imu_q, imu_p, imu_v, imu_bg, imu_ba])

    # Calibration blocks exist in the error state only when their layout flag
    # is on (layout.py); a disabled block's mean is simply carried through.
    calib_dt = state.calib_dt + dx[lay.dt_idx] if lay.calib_dt else state.calib_dt
    if lay.calib_pose:
        cam_q = quat_boxplus(state.calib_cam[0:4], dx[lay.cam_pose_idx:lay.cam_pose_idx + 3])
        cam_p = state.calib_cam[4:7] + dx[lay.cam_pose_idx + 3:lay.cam_pose_idx + 6]
        calib_cam = jnp.concatenate([cam_q, cam_p])
    else:
        calib_cam = state.calib_cam
    cam_zeta = (state.cam_zeta + dx[lay.cam_intr_idx:lay.cam_intr_idx + 8]
                if lay.calib_intr else state.cam_zeta)

    K = lay.max_clones
    dclone = jax.lax.dynamic_slice(dx, (lay.clone_base,), (6 * K,)).reshape(K, 6)
    clones_q = jax.vmap(quat_boxplus)(state.clones_q, dclone[:, 0:3])
    clones_p = state.clones_p + dclone[:, 3:6]

    L = lay.max_slam
    dslam = jax.lax.dynamic_slice(dx, (lay.slam_base,), (3 * L,)).reshape(L, 3)
    slam_p = state.slam_p + dslam

    P = lay.max_planes
    dplane = jax.lax.dynamic_slice(dx, (lay.plane_base,), (3 * P,)).reshape(P, 3)
    plane_cp = state.plane_cp + dplane

    return state.replace(
        imu=imu, calib_dt=calib_dt, calib_cam=calib_cam, cam_zeta=cam_zeta,
        clones_q=clones_q, clones_p=clones_p, slam_p=slam_p, plane_cp=plane_cp,
    )


@jax.jit
def ekf_update(state: VioState, H: jnp.ndarray, res: jnp.ndarray, r_diag: jnp.ndarray):
    """kalman_update + apply_dx in one step. Returns (new_state, chi2)."""
    dx, new_cov, chi2 = kalman_update(state.cov, H, res, r_diag)
    return apply_dx(state.replace(cov=new_cov), dx), chi2


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3×3 inverse (adjugate/determinant). TPU-safe in f64 — XLA's
    LuDecomposition has no f64 TPU lowering, and 3×3 adjugate is faster anyway."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A00 = e * i - f * h
    A01 = -(d * i - f * g)
    A02 = d * h - e * g
    det = a * A00 + b * A01 + c * A02
    det = jnp.where(jnp.abs(det) < 1e-300, 1e-300, det)
    adj = jnp.array(
        [
            [A00, -(b * i - c * h), (b * f - c * e)],
            [A01, (a * i - c * g), -(a * f - c * d)],
            [A02, -(a * h - b * g), (a * e - b * d)],
        ]
    )
    return adj / det


# ---------------------------------------------------------------------------
# QR machinery: nullspace projection / compression / delayed init
# ---------------------------------------------------------------------------

@jax.jit
def _householder_qt(A: jnp.ndarray, X: jnp.ndarray):
    """Triangularize A [M, c] (c small, static) with c Householder reflectors,
    applying the same Qᵀ to X [M, R]. Returns (QᵀA upper-triangular in its top
    c rows, QᵀX).

    Statically unrolled over the c columns: each step is two matvecs and two
    rank-1 updates — batched dense ops under vmap, instead of
    `jnp.linalg.qr(mode="complete")`'s per-matrix loop forming an [M, M] Q
    (the TPU-hostile path: thousands of tiny sequential QRs per filter step).
    Zero (masked) rows stay exactly zero; an all-zero column applies no
    reflection. Norms are where-guarded so the jvp at 0 stays finite (same
    hygiene as ops/quat).
    """
    c = A.shape[1]
    dtype = A.dtype
    rows = jnp.arange(A.shape[0])
    tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-18, dtype)
    for j in range(c):
        col = jnp.where(rows >= j, A[:, j], 0)
        s2 = jnp.sum(col * col)
        nrm = jnp.sqrt(jnp.where(s2 > tiny, s2, 1))
        sign = jnp.where(col[j] >= 0, 1, -1).astype(dtype)
        # v = col + sign·‖col‖·e_j (additive form avoids cancellation).
        v = col.at[j].add(sign * nrm)
        v2 = jnp.sum(v * v)
        scale = jnp.where(s2 > tiny, 2.0 / jnp.where(v2 > tiny, v2, 1), 0)
        A = A - scale * jnp.outer(v, v @ A)
        X = X - scale * jnp.outer(v, v @ X)
    return A, X


def nullspace_project(H_f: jnp.ndarray, H_x: jnp.ndarray, res: jnp.ndarray):
    """Left-nullspace projection of H_f applied to (H_x, res)
    (UpdaterHelper::nullspace_project_inplace, UpdaterHelper.cpp:515-546 — a
    Givens chain there; c Householder reflectors here).

    H_f: [M, c]. Returns (H_x'[M-c, Dx], res'[M-c]) — rows beyond the real
    rank are zero and harmless. Masked rows must be zero in all three inputs.
    The returned rows are one valid orthonormal-basis representation of the
    projected system; every consumer (gram, chi2, EKF update) is invariant to
    the basis choice.
    """
    c = H_f.shape[1]
    _, Xt = _householder_qt(H_f, jnp.concatenate([H_x, res[:, None]], axis=1))
    return Xt[c:, :-1], Xt[c:, -1]


@functools.partial(jax.jit, static_argnames=("out_rows",))
def measurement_compress(H: jnp.ndarray, res: jnp.ndarray, out_rows: int | None = None):
    """Thin-QR measurement compression (UpdaterHelper::measurement_compress_inplace,
    UpdaterHelper.cpp:548-579).

    H: [M, D] -> returns (R[r, D], Qᵀres[r]) with r = out_rows or min(M, D).
    The discarded residual component is orthogonal to the column space, exactly
    as in the reference's Givens version.
    """
    m, d = H.shape
    r = min(m, d) if out_rows is None else out_rows
    q_thin, r_mat = jnp.linalg.qr(H, mode="reduced")   # [M, min(M,D)], [min(M,D), D]
    res2 = q_thin.T @ res
    return r_mat[:r], res2[:r]


@jax.jit
def info_compress_rows(M_big: jnp.ndarray) -> jnp.ndarray:
    """Triangular compressed rows of a stacked block via the information form:
    returns R [C, C] with RᵀR = M_bigᵀ M_big — the same R factor thin QR
    produces (chol(G) = Lᵀ = R up to the sign convention) whenever the
    nonzero columns' Gram is numerically SPD, which is the generic case for
    these stacks. Rank-deficient stacks (rows < columns, or linearly
    dependent columns) fall back to an eps·I-jittered Cholesky
    (eps = 1e-7 f32 / 1e-14 f64), selected per call by a finite check on the
    exact factor — there RᵀR = G only to ~eps relative.

    Why not jnp.linalg.qr: on TPU a [rows, C] QR is a sequential Householder
    custom call whose latency scales with C regardless of rows (measured: the
    plane paths' per-candidate QRs dominated the plane machinery's ~79 ms at
    B=32). The gram contraction is one MXU matmul; the [C, C] Cholesky is the
    only remaining custom call. Same square-the-condition trade as the
    validated classic-path info compression (UpdaterHelper.cpp:548-579 is the
    Givens original of both forms).
    """
    C = M_big.shape[1]
    # Column equilibration: the stacked block mixes units (CP columns, state
    # columns, the residual), so cond(G) = cond(M)² easily exceeds f32's
    # range and a raw f32 Cholesky corrupts the downstream init gates
    # (measured: plane delayed-init silently stopped firing on the TPU).
    # Scaling M's columns to unit norm is EXACT — R = chol(GL)ᵀ·diag(s)
    # satisfies RᵀR = G bit-for-the-same-math — and removes the unit spread
    # from the conditioning before the square.
    s = jnp.sqrt(jnp.sum(M_big * M_big, axis=0))
    nz = s > 0
    sg = jnp.where(nz, s, 1.0)
    Mn = M_big / sg[None, :]
    G = Mn.T @ Mn
    # Identity-embed the all-zero columns (masked state dims, padded slots):
    # their row/col in G is zero, so a unit pivot lets the factorization pass
    # through them with L[:,j] = e_j, and the final column scaling by s_j = 0
    # removes the embedded entry exactly — row j of the returned R is
    # identically zero, the valid semidefinite factor. (The round-4 eps·I
    # jitter instead left spurious √eps rows on every masked dim and made
    # RᵀR = G only approximate even for full-rank stacks.)
    Ge = G + jnp.diag(jnp.where(nz, 0.0, 1.0).astype(G.dtype))
    L = jnp.linalg.cholesky(Ge)
    eps = jnp.asarray(1e-7 if G.dtype == jnp.float32 else 1e-14, G.dtype)
    Lj = jnp.linalg.cholesky(Ge + eps * jnp.eye(C, dtype=G.dtype))
    L = jnp.where(jnp.all(jnp.isfinite(L)), L, Lj)
    return L.T * jnp.where(nz, s, 0.0)[None, :]


@jax.jit
def qr_init_split(H_L: jnp.ndarray, H_R: jnp.ndarray, res: jnp.ndarray):
    """Rotate [H_L | H_R | res] so the top rows isolate the new variable
    (StateHelper::initialize, StateHelper.cpp:434-458).

    H_L: [M, c] (new-variable Jacobian). Returns
    (H_L_init[c, c], H_R_init[c, D], res_init[c], H_R_up[M-c, D], res_up[M-c]).
    """
    c = H_L.shape[1]
    A, Xt = _householder_qt(H_L, jnp.concatenate([H_R, res[:, None]], axis=1))
    H_R2, res2 = Xt[:, :-1], Xt[:, -1]
    return A[:c, :c], H_R2[:c], res2[:c], H_R2[c:], res2[c:]


@jax.jit
def initialize_invertible(state: VioState, slot_start, H_R: jnp.ndarray, H_L: jnp.ndarray,
                          r_diag: jnp.ndarray, res: jnp.ndarray):
    """Initialize a c-dof variable in a (zeroed) slot via an invertible system
    (StateHelper::initialize_invertible, StateHelper.cpp:489-586).

    H_R: [c, D] full-width Jacobian w.r.t. existing states; H_L: [c, c]
    invertible Jacobian w.r.t. the new variable. Returns (new_cov, dx_new[c]):
    the caller writes `value ⊞ dx_new` into the slot and sets fej.
    """
    c = H_L.shape[0]
    Ma = state.cov @ H_R.T                              # [D, c]
    M = H_R @ Ma + jnp.diag(r_diag)                     # [c, c]
    H_Linv = inv3(H_L) if c == 3 else jnp.linalg.inv(H_L)
    P_LL = H_Linv @ M @ H_Linv.T
    cross = -Ma @ H_Linv.T                              # [D, c]
    cov = state.cov
    slot_start = jnp.asarray(slot_start)
    z = jnp.zeros((), slot_start.dtype)
    cov = jax.lax.dynamic_update_slice(cov, cross, (z, slot_start))
    cov = jax.lax.dynamic_update_slice(cov, cross.T, (slot_start, z))
    cov = jax.lax.dynamic_update_slice(cov, P_LL, (slot_start, slot_start))
    dx_new = H_Linv @ res
    return cov, dx_new


@functools.partial(jax.jit, static_argnames=("size",))
def marginal_block(cov: jnp.ndarray, start, size: int) -> jnp.ndarray:
    """Extract a [size, size] diagonal block (get_marginal_covariance for one
    contiguous variable; general small-set gating uses full-width H instead)."""
    return jax.lax.dynamic_slice(cov, (start, start), (size, size))
