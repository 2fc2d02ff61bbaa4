"""Batched MSCKF update.

Re-design of ``UpdaterMSCKF::update`` (update/UpdaterMSCKF.cpp:65-828) as one
fixed-shape batched pipeline:

  gather M selected features → batched triangulation (ops/triangulation) →
  vmapped stacked Jacobians (models/jacobians) → per-feature QR nullspace
  projection of H_f → per-feature chi2 gate (95% table × multiplier,
  UpdaterMSCKF.cpp:738-764) → stack surviving rows → thin-QR compression →
  one EKF update.

Plane handling (per-plane grouped updates, CP recovery) lives in
models/plane_msckf.py; this module implements the classic point path
(UpdaterMSCKF.cpp:656-814) plus optional point-on-plane rows for features
whose plane is already a state (routed into the plane state's columns by the
Jacobian builder).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.models.jacobians import JacobianOptions, clone_set_from_state, feature_jacobian_full
from ov_plane_tpu.ops import ekf
from ov_plane_tpu.ops.triangulation import TriangulationOptions, triangulate
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.chi2 import CHI2_095_TABLE


class MsckfOptions(NamedTuple):
    jac: JacobianOptions = JacobianOptions()
    tri: TriangulationOptions = TriangulationOptions()
    sigma_px: float = 1.0
    chi2_multipler: float = 5.0
    sigma_c: float = 0.05
    use_plane_constraint: bool = False
    # Information-form compression (fused Pallas HᵀH on TPU) instead of QR:
    # ~50x faster reduction; squares the conditioning, fine for whitened rows.
    use_info_compression: bool = False
    # In-loop sharded Schur reduction (SURVEY §2.4 item 3): when set to a mesh
    # axis name and the step runs under `jax.set_mesh`, the stacked Jacobian
    # rows are sharding-constrained over that axis so GSPMD partitions the
    # per-feature Jacobian build + gram reduction Λ=HᵀH, η=Hᵀr across devices
    # and inserts the psum — the distributed generalization of the reference's
    # sequential Givens compression (UpdaterHelper.cpp:548-579).
    shard_axis: str = ""


@functools.partial(jax.jit, static_argnames=("opts",))
def msckf_update(
    state: VioState,
    opts: MsckfOptions,
    sel_uv,          # [M, K, 2] distorted pixel observations
    sel_uvn,         # [M, K, 2] normalized observations
    sel_mask,        # [M, K] observation mask (already ANDed with selection validity)
    sel_plane_cp,    # [M, 3] plane CP per feature (zeros if none)
    sel_plane_cp_fej,
    sel_has_plane,   # [M] bool: apply point-on-plane rows
    sel_plane_in_state,  # [M] bool
    sel_plane_slot,  # [M] int32
    gt_p=None,       # [M, 3] true feature positions (use_groundtruths)
):
    """Returns (new_state, used[M] bool, p_FinG[M,3], tri_ok[M])."""
    lay = state.layout
    K = lay.max_clones
    D = lay.dim
    dtype = sel_uv.dtype
    M = sel_uv.shape[0]

    clone_active = jnp.isfinite(state.clones_t)
    sel_mask = sel_mask & clone_active[None, :]

    clones = clone_set_from_state(state)
    # Triangulate from current estimates (UpdaterMSCKF.cpp:123-194).
    p_f, tri_ok = triangulate(sel_uvn, sel_mask, clones.R_GtoC, clones.p_CinG, opts.tri)
    if gt_p is not None:
        # Ground-truth injection (UpdaterMSCKF.cpp:284-302): replace the
        # triangulated positions with the simulator's truth; the triangulation
        # gate is bypassed for features with a nonzero truth.
        has_gt = jnp.any(gt_p != 0.0, axis=1)
        p_f = jnp.where(has_gt[:, None], gt_p, p_f)
        tri_ok = tri_ok | has_gt

    # Stacked Jacobians per feature; FEJ feature value = triangulated value
    # (UpdaterMSCKF sets p_FinG_fej = p_FinG for fresh triangulations).
    # Anchored representations anchor at the newest observing clone (ov_core
    # sets anchor_clone_timestamp to the feature's last observation).
    slot_t = jnp.where(sel_mask, state.clones_t[None, :], -jnp.inf)
    anchor_slot = jnp.argmax(slot_t, axis=1).astype(jnp.int32)          # [M]

    def jac_one(uv, mask, pf, cp, cp_fej, has_plane, in_state, pslot, aslot):
        return feature_jacobian_full(
            lay, opts.jac, clones, uv, mask, pf, pf, cp, cp_fej,
            has_plane, in_state, pslot, opts.sigma_px, opts.sigma_c,
            anchor_slot=aslot,
        )

    use_plane = sel_has_plane & jnp.asarray(opts.use_plane_constraint)
    H_x, H_f, res, rmask = jax.vmap(jac_one)(
        sel_uv, sel_mask, p_f, sel_plane_cp, sel_plane_cp_fej,
        use_plane, sel_plane_in_state, sel_plane_slot, anchor_slot,
    )  # H_x [M, 3K, D], H_f [M, 3K, 6], res [M, 3K], rmask [M, 3K]

    # Zero out everything for features that failed triangulation.
    ok = tri_ok
    H_x = H_x * ok[:, None, None]
    H_f = H_f * ok[:, None, None]
    res = res * ok[:, None]
    rmask = rmask & ok[:, None]

    # Nullspace-project the feature position (3 cols) per feature. Features
    # whose plane is NOT in the state marginalize cp too (6 cols) — that path
    # is handled by plane_msckf; here only the point columns are projected.
    def proj_one(hx, hf, r):
        return ekf.nullspace_project(hf[:, 0:3], jnp.concatenate([hx, r[:, None]], axis=1), r)

    Hxr2, _ = jax.vmap(proj_one)(H_x, H_f, res)     # [M, 3K-3, D+1]
    H_x2 = Hxr2[:, :, :D]
    res2 = Hxr2[:, :, D]

    # Per-feature chi2 gate: S = H2 P H2ᵀ + I (whitened rows).
    def chi2_one(h2, r2):
        S = h2 @ (state.cov @ h2.T) + jnp.eye(h2.shape[0], dtype=dtype)
        return r2 @ jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S, lower=True), r2)

    chi2 = jax.vmap(chi2_one)(H_x2, res2)
    n_obs = jnp.sum(sel_mask, axis=1)
    dof_rows = jnp.where(use_plane, 3 * n_obs, 2 * n_obs) - 3
    table = jnp.asarray(CHI2_095_TABLE, dtype)
    gate = chi2 <= opts.chi2_multipler * table[jnp.clip(dof_rows, 1, table.shape[0] - 1)]
    passed = ok & gate & (n_obs >= 2)

    H_x2 = H_x2 * passed[:, None, None]
    res2 = res2 * passed[:, None]

    # Stack, compress, update.
    H_big = H_x2.reshape(M * (3 * K - 3), D)
    r_big = res2.reshape(M * (3 * K - 3))
    if opts.shard_axis:
        # Shard the measurement rows over the named mesh axis; the gram
        # contraction then runs as per-shard partial sums + an XLA psum
        # (see parallel/schur.py for the standalone shard_map form).
        from jax.sharding import PartitionSpec as P

        from ov_plane_tpu.parallel.schur import information_to_compressed

        H_big = jax.lax.with_sharding_constraint(H_big, P(opts.shard_axis, None))
        r_big = jax.lax.with_sharding_constraint(r_big, P(opts.shard_axis))
        lam = H_big.T @ H_big
        eta = H_big.T @ r_big
        H_c, r_c = information_to_compressed(lam, eta)
    elif opts.use_info_compression:
        from ov_plane_tpu.ops.pallas_kernels import gram_reduce
        from ov_plane_tpu.parallel.schur import information_to_compressed

        lam, eta = gram_reduce(H_big, r_big)
        H_c, r_c = information_to_compressed(lam, eta)       # [D, D]
    else:
        H_c, r_c = ekf.measurement_compress(H_big, r_big)    # [D, D]
    any_rows = jnp.any(passed)
    r_diag = jnp.ones((H_c.shape[0],), dtype)
    dx, new_cov, _ = ekf.kalman_update(state.cov, H_c, r_c, r_diag)
    new_state = ekf.apply_dx(state.replace(cov=new_cov), dx)
    new_state = jax.tree.map(lambda new, old: jnp.where(any_rows, new, old), new_state, state)

    return new_state, passed, p_f, tri_ok
