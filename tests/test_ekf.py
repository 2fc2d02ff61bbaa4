"""Oracle tests for the EKF kernel library (vs NumPy float64 textbook
implementations on random SPD systems) — SURVEY.md §7.2 step 2, substituting
for the reference's missing unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.ops import ekf
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState

RNG = np.random.default_rng(1)
LAY = StateLayout(max_clones=4, max_slam=3, max_planes=2)
D = LAY.dim


def random_spd(d, rng=RNG):
    A = rng.normal(size=(d, d))
    return A @ A.T + d * np.eye(d)


def test_kalman_update_oracle():
    P = random_spd(D)
    M = 7
    H = RNG.normal(size=(M, D))
    res = RNG.normal(size=M)
    r_diag = RNG.uniform(0.5, 2.0, size=M)
    dx, newP, chi2 = ekf.kalman_update(jnp.asarray(P), jnp.asarray(H), jnp.asarray(res), jnp.asarray(r_diag))
    # NumPy oracle.
    S = H @ P @ H.T + np.diag(r_diag)
    K = P @ H.T @ np.linalg.inv(S)
    np.testing.assert_allclose(np.asarray(dx), K @ res, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(newP), P - K @ H @ P, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(float(chi2), res @ np.linalg.solve(S, res), rtol=1e-9)


def test_kalman_update_masked_rows_are_noops():
    P = random_spd(D)
    M = 6
    H = RNG.normal(size=(M, D))
    res = RNG.normal(size=M)
    r = np.ones(M)
    dx1, P1, _ = ekf.kalman_update(jnp.asarray(P), jnp.asarray(H), jnp.asarray(res), jnp.asarray(r))
    # Same system + 4 masked rows (zero H, zero res, unit R).
    Hm = np.vstack([H, np.zeros((4, D))])
    resm = np.concatenate([res, np.zeros(4)])
    rm = np.concatenate([r, np.ones(4)])
    dx2, P2, _ = ekf.kalman_update(jnp.asarray(P), jnp.asarray(Hm), jnp.asarray(resm), jnp.asarray(rm))
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-10)


def test_propagate_cov_oracle():
    P = random_spd(D)
    Phi = RNG.normal(size=(15, 15))
    Qd = random_spd(15)
    newP = np.asarray(ekf.propagate_cov(jnp.asarray(P), jnp.asarray(Phi), jnp.asarray(Qd)))
    # Oracle: full-size Phi.
    Phi_full = np.eye(D)
    Phi_full[:15, :15] = Phi
    Q_full = np.zeros((D, D))
    Q_full[:15, :15] = Qd
    expected = Phi_full @ P @ Phi_full.T + Q_full
    np.testing.assert_allclose(newP, expected, rtol=1e-9, atol=1e-8)


def test_zero_slot_and_clone_block():
    P = random_spd(D)
    start, size = LAY.clone_idx(1), 6
    Pz = np.asarray(ekf.zero_slot(jnp.asarray(P), start, size))
    assert np.all(Pz[start:start + size, :] == 0)
    assert np.all(Pz[:, start:start + size] == 0)
    # Clone IMU pose (rows 0:6) into the zeroed slot.
    Pc = np.asarray(ekf.clone_block(jnp.asarray(Pz), 0, start, 6))
    np.testing.assert_allclose(Pc[start:start + 6, start:start + 6], Pz[0:6, 0:6], atol=1e-12)
    np.testing.assert_allclose(Pc[start:start + 6, 0:6], Pz[0:6, 0:6], atol=1e-12)
    np.testing.assert_allclose(Pc[7:10, start:start + 6], Pz[7:10, 0:6], atol=1e-12)


def test_nullspace_project_removes_feature_dependence():
    M, c, Dx = 12, 3, 20
    H_f = RNG.normal(size=(M, c))
    H_x = RNG.normal(size=(M, Dx))
    noise = RNG.normal(size=M)
    for f in [np.zeros(c), RNG.normal(size=c) * 10]:
        res = H_f @ f + noise
        H2, r2 = ekf.nullspace_project(jnp.asarray(H_f), jnp.asarray(H_x), jnp.asarray(res))
        if f[0] == 0:
            H2_ref, r2_ref = np.asarray(H2), np.asarray(r2)
        else:
            np.testing.assert_allclose(np.asarray(H2), H2_ref, atol=1e-9)
            np.testing.assert_allclose(np.asarray(r2), r2_ref, atol=1e-8)
    # Information preserved: H2ᵀH2 == Hxᵀ N Nᵀ Hx where N spans the left nullspace.
    assert np.asarray(H2).shape == (M - c, Dx)


def test_nullspace_project_mask_safe():
    M, c, Dx = 10, 3, 8
    H_f = RNG.normal(size=(M, c))
    H_x = RNG.normal(size=(M, Dx))
    res = RNG.normal(size=M)
    H2a, r2a = ekf.nullspace_project(jnp.asarray(H_f), jnp.asarray(H_x), jnp.asarray(res))
    # Pad with zero rows: projected system must contain the same information.
    pad = 4
    H_fp = np.vstack([H_f, np.zeros((pad, c))])
    H_xp = np.vstack([H_x, np.zeros((pad, Dx))])
    resp = np.concatenate([res, np.zeros(pad)])
    H2b, r2b = ekf.nullspace_project(jnp.asarray(H_fp), jnp.asarray(H_xp), jnp.asarray(resp))
    gram_a = np.asarray(H2a).T @ np.asarray(H2a)
    gram_b = np.asarray(H2b).T @ np.asarray(H2b)
    np.testing.assert_allclose(gram_a, gram_b, atol=1e-8)
    np.testing.assert_allclose(np.asarray(H2a).T @ np.asarray(r2a), np.asarray(H2b).T @ np.asarray(r2b), atol=1e-8)


def test_measurement_compress_information_equivalent():
    M, Dx = 30, 12
    H = RNG.normal(size=(M, Dx))
    res = RNG.normal(size=M)
    Hc, rc = ekf.measurement_compress(jnp.asarray(H), jnp.asarray(res))
    assert np.asarray(Hc).shape == (Dx, Dx)
    np.testing.assert_allclose(np.asarray(Hc).T @ np.asarray(Hc), H.T @ H, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Hc).T @ np.asarray(rc), H.T @ res, atol=1e-8)


def test_info_compress_rows_exact_on_full_rank():
    """Generic case: RᵀR = MᵀM to machine precision (no jitter on the exact
    path), and all-zero columns (masked state dims) yield identically-zero
    rows/columns of R — the semidefinite factor, not √eps residue."""
    M, C = 80, 20
    A = RNG.normal(size=(M, C))
    A[:, [3, 11, 17]] = 0.0           # masked columns
    A[:, 5] *= 1e4                    # mixed units (equilibration path)
    R = np.asarray(ekf.info_compress_rows(jnp.asarray(A)))
    assert R.shape == (C, C)
    np.testing.assert_allclose(R.T @ R, A.T @ A, rtol=1e-12, atol=1e-12)
    for j in (3, 11, 17):
        assert np.all(R[j, :] == 0.0) and np.all(R[:, j] == 0.0)


def test_info_compress_rows_rank_deficient_fallback():
    """Fewer rows than (nonzero) columns → the guarded jittered fallback:
    finite output with RᵀR ≈ MᵀM at the jitter scale."""
    M, C = 6, 12
    A = RNG.normal(size=(M, C))
    R = np.asarray(ekf.info_compress_rows(jnp.asarray(A)))
    assert np.isfinite(R).all()
    np.testing.assert_allclose(R.T @ R, A.T @ A, atol=1e-6)
    # All-zero input compresses to exactly zero (padded empty group stacks).
    Rz = np.asarray(ekf.info_compress_rows(jnp.zeros((M, C))))
    assert np.all(Rz == 0.0)


def test_qr_init_split_consistency():
    M, c, Dx = 14, 3, 10
    H_L = RNG.normal(size=(M, c))
    H_R = RNG.normal(size=(M, Dx))
    res = RNG.normal(size=M)
    HL_i, HR_i, res_i, HR_u, res_u = ekf.qr_init_split(jnp.asarray(H_L), jnp.asarray(H_R), jnp.asarray(res))
    # Stacked rotated system must carry the same normal equations.
    HL_full = np.vstack([np.asarray(HL_i), np.zeros((M - c, c))])
    HR_full = np.vstack([np.asarray(HR_i), np.asarray(HR_u)])
    res_full = np.concatenate([np.asarray(res_i), np.asarray(res_u)])
    big = np.hstack([H_L, H_R])
    big_rot = np.hstack([HL_full, HR_full])
    np.testing.assert_allclose(big_rot.T @ big_rot, big.T @ big, atol=1e-8)
    np.testing.assert_allclose(big_rot.T @ res_full, big.T @ res, atol=1e-8)


def test_initialize_invertible_oracle():
    state = VioState.create(LAY)
    P0 = random_spd(D)
    # Only existing states should carry covariance in the plane slot test:
    slot = LAY.plane_idx(0)
    P0[slot:slot + 3, :] = 0
    P0[:, slot:slot + 3] = 0
    state = state.replace(cov=jnp.asarray(P0))
    H_R = RNG.normal(size=(3, D))
    H_R[:, slot:slot + 3] = 0
    H_L = RNG.normal(size=(3, 3)) + 3 * np.eye(3)
    res = RNG.normal(size=3)
    r_diag = np.full(3, 0.25)
    new_cov, dx_new = ekf.initialize_invertible(
        state, slot, jnp.asarray(H_R), jnp.asarray(H_L), jnp.asarray(r_diag), jnp.asarray(res)
    )
    # Oracle (StateHelper.cpp:518-577 with static layout):
    Ma = P0 @ H_R.T
    Mm = H_R @ Ma + np.diag(r_diag)
    H_Linv = np.linalg.inv(H_L)
    P_LL = H_Linv @ Mm @ H_Linv.T
    cross = -Ma @ H_Linv.T
    np.testing.assert_allclose(np.asarray(new_cov)[slot:slot + 3, slot:slot + 3], P_LL, atol=1e-8)
    # Cross-covariance rows (excluding the slot's own diagonal block, which holds P_LL).
    keep = np.ones(D, bool)
    keep[slot:slot + 3] = False
    np.testing.assert_allclose(np.asarray(new_cov)[keep][:, slot:slot + 3], cross[keep], atol=1e-8)
    np.testing.assert_allclose(np.asarray(dx_new), H_Linv @ res, atol=1e-10)
    # Joint covariance must be PSD.
    eigs = np.linalg.eigvalsh(np.asarray(new_cov))
    assert eigs.min() > -1e-8


def test_apply_dx_quaternion_boxplus():
    state = VioState.create(LAY)
    dx = np.zeros(D)
    dth = np.array([0.01, -0.02, 0.03])
    dx[LAY.IMU_TH:LAY.IMU_TH + 3] = dth
    dx[LAY.IMU_P:LAY.IMU_P + 3] = [1.0, 2.0, 3.0]
    new = ekf.apply_dx(state, jnp.asarray(dx))
    from ov_plane_tpu.ops.quat import quat_2_rot, quat_multiply, quat_norm
    R_new = np.asarray(quat_2_rot(new.imu[0:4]))
    # Exact JPL boxplus: q_new = norm([dth/2, 1]) ⊗ q_old (PoseJPL::update).
    dq = quat_norm(jnp.asarray(np.concatenate([0.5 * dth, [1.0]])))
    q_expect = quat_multiply(dq, state.imu[0:4])
    np.testing.assert_allclose(R_new, np.asarray(quat_2_rot(q_expect)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(new.imu[4:7]), [1.0, 2.0, 3.0], atol=1e-12)
