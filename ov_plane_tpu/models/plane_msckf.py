"""Per-plane grouped MSCKF updates for planes NOT in the state.

Re-design of the plane half of ``UpdaterMSCKF::update``
(update/UpdaterMSCKF.cpp:197-649): features sharing an out-of-state plane are
updated together — the plane CP is recovered on the fly (LSQ fit + joint GN,
:223-293), each feature's point columns are nullspace-projected (keeping CP),
the stacked system then has its CP columns nullspace-projected away
(marginalized, :591-604) and is chi2-gated per plane (:606-631); all
surviving groups' compressed rows stack into ONE EKF update (:647) — the
group bodies vmap (every Cholesky/Householder batches across groups) and
only a single latency-bound update chain runs per frame.

Features consumed here are excluded from the classic point update (the caller
gets a used-mask back).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.jacobians import clone_set_from_state, feature_jacobian_full
from ov_plane_tpu.models.plane_init import PlaneInitOptions
from ov_plane_tpu.ops import ekf
from ov_plane_tpu.ops.planefit import fit_plane_lsq, refine_plane_joint
from ov_plane_tpu.ops.triangulation import triangulate
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.chi2 import CHI2_095_TABLE


class PlaneMsckfOptions(NamedTuple):
    base: PlaneInitOptions = PlaneInitOptions()
    chi2_multipler: float = 5.0
    plane_msckf_min_feat: int = 5
    plane_msckf_max_cond: float = 50.0
    # Static bound on grouped plane updates per frame. The reference has NO
    # such cap — it processes every plane group in the frame
    # (UpdaterMSCKF.cpp:411-649) — but a fixed-shape XLA program needs one.
    # It is plumbed from config (`tpu.max_planes_per_frame`) and sized so the
    # cap is unreachable at default gates: each group needs
    # plane_msckf_min_feat (5) members inside the M-feature MSCKF selection,
    # so M=40 admits at most 8 qualifying groups. Groups that DO overflow are
    # counted and surfaced (StepOutput.n_plane_dropped + the plane CSV), never
    # silently discarded.
    max_planes_per_frame: int = 8


@functools.partial(jax.jit, static_argnames=("opts",))
def msckf_plane_update(state: VioState, bank: fb.FeatureBank, opts: PlaneMsckfOptions,
                       sel_idx, sel_valid):
    """Grouped plane updates over the MSCKF selection.

    sel_idx/sel_valid: the frame's MSCKF feature selection [M].
    Returns (new_state, consumed_sel_mask[M], n_plane_updates, n_dropped):
    n_dropped counts qualifying plane groups beyond the static
    ``max_planes_per_frame`` cap (support ≥ plane_msckf_min_feat but not
    selected) — the reference processes every group, so a nonzero count here
    flags a capacity parity gap for the frame.
    """
    lay = state.layout
    K = lay.max_clones
    D = lay.dim
    dtype = state.imu.dtype
    M = sel_idx.shape[0]
    Mp = opts.base.max_msckf_plane
    table = jnp.asarray(CHI2_095_TABLE, dtype)
    clone_active = jnp.isfinite(state.clones_t)

    pid = jnp.where(sel_valid, bank.planeid[sel_idx], -1)
    in_state = jnp.any(
        (pid[:, None] == state.plane_id[None, :]) & state.plane_active[None, :], axis=1
    )
    pid = jnp.where(in_state, -1, pid)  # only out-of-state planes here

    # Distinct candidate planes among the selection, ranked by support.
    eq = (pid[:, None] == pid[None, :]) & (pid >= 0)[:, None]
    count = jnp.sum(eq, axis=1)
    lower = jnp.tril(jnp.ones((M, M), bool), k=-1)
    is_first = ~jnp.any(eq & lower, axis=1) & (pid >= 0)
    score = jnp.where(is_first & (count >= opts.plane_msckf_min_feat), count, -1)
    cand_scores, cand_pos = jax.lax.top_k(score, opts.max_planes_per_frame)
    cand_pids = jnp.where(cand_scores > 0, pid[cand_pos], -1)
    # Qualifying groups that did NOT fit under the static cap (visibility:
    # the reference has no cap, UpdaterMSCKF.cpp:411-649).
    n_qualifying = jnp.sum(score > 0)
    n_dropped = jnp.maximum(n_qualifying - opts.max_planes_per_frame, 0)

    # STACKED grouped update (round 4): all plane groups build their rows off
    # the SAME pre-update state, each group is chi2-gated against the same
    # pre-update covariance, the survivors' compressed rows stack into ONE
    # EKF update — exactly the reference's dataflow (UpdaterMSCKF.cpp:411-649
    # stacks every group's projected rows into Hx_big and calls EKFUpdate
    # once at :647). The previous lax.scan ran the full group body (GN
    # refine, Householder chains, compression Cholesky, Kalman update)
    # max_planes_per_frame times SEQUENTIALLY even when most slots were
    # empty; vmapping the group body batches every custom call ([G, C, C]
    # Cholesky instead of G sequential ones) and leaves a single
    # latency-bound update chain per frame.
    clones = clone_set_from_state(state)

    def group(c):
        plane = cand_pids[c]
        valid = plane >= 0

        members = (pid == plane) & sel_valid & valid          # [M]
        fscore = jnp.where(members, bank.n_obs[sel_idx], -1)
        fs, fpos = jax.lax.top_k(fscore, Mp)                  # positions within selection
        fvalid = fs >= 2
        rows = sel_idx[fpos]

        uv = bank.uv[rows]
        uvn = bank.uvn[rows]
        masks = bank.mask[rows] & fvalid[:, None] & clone_active[None, :]

        p_f, tri_ok = triangulate(uvn, masks, clones.R_GtoC, clones.p_CinG, opts.base.tri)
        fvalid = fvalid & tri_ok
        masks = masks & fvalid[:, None]

        cp0, cond, fit_ok = fit_plane_lsq(p_f, fvalid)
        valid = valid & fit_ok & (cond <= opts.plane_msckf_max_cond) & (jnp.sum(fvalid) >= opts.plane_msckf_min_feat)
        p_tri = p_f            # PRE-refine triangulations (honest noise scale)
        cp, p_f2, ref_ok, inl = refine_plane_joint(
            cp0, p_f, uvn, masks, fvalid, jnp.zeros_like(fvalid),
            clones.R_GtoC, clones.p_CinG, opts.base.refine,
        )
        if opts.base.refine.max_error_threshold > 0.0:
            # Reference semantics: optimize_plane failure skips the whole
            # plane group — its members fall back to the classic point
            # update (UpdaterMSCKF.cpp:353-356) — and survivors are pruned
            # to the re-accepted inlier set (PlaneFitting.cpp:452-481).
            valid = valid & ref_ok
            fvalid = fvalid & inl
            masks = masks & fvalid[:, None]
            valid = valid & (jnp.sum(fvalid) >= opts.plane_msckf_min_feat)
            p_f = p_f2
        else:
            cp = jnp.where(ref_ok, cp, cp0)
            p_f = jnp.where(ref_ok, p_f2, p_f)

        sigma_c_run = jnp.asarray(opts.base.sigma_c, dtype)
        if opts.base.sigma_c_adaptive:
            # Tilt-aware constraint whitening: a plane fitted to a PATCH of
            # lateral spread s from points with normal-direction noise σ_z
            # carries a normal-tilt error ~σ_z/s, which displaces the CP by
            # ‖cp‖·σ_z/s — the dominant plane error for small close-range
            # patches (measured on the tabletop diag: an init 8.5 cm off
            # truth from ±1.8 cm-clean triangulations, then constraint rows
            # dragging the pose ~1 mm/frame). Scatter-only inflation is
            # blind to it (tilt leaves residuals small); this form charges
            # each group for its own geometry.
            # σ_z from the PRE-refine triangulations vs the refined plane:
            # post-refine residuals are already shrunk toward the plane and
            # underestimate the information-limiting noise.
            d_pl = jnp.maximum(jnp.linalg.norm(cp), 1e-9)
            n_pl = cp / d_pl
            fv = fvalid.astype(dtype)
            F_n = jnp.maximum(jnp.sum(fv), 1.0)
            r_pp = (p_tri @ n_pl - d_pl) * fv
            s2_z = jnp.sum(r_pp**2) / F_n
            c_lat = jnp.sum(p_f * fv[:, None], axis=0) / F_n
            rel = (p_f - c_lat) * fv[:, None]
            lat = rel - (rel @ n_pl)[:, None] * n_pl[None, :]
            s2_lat = jnp.maximum(jnp.sum(lat**2) / F_n, 1e-6)
            tilt = d_pl * jnp.sqrt(s2_z / s2_lat)
            sigma_c_run = jnp.sqrt(opts.base.sigma_c**2 + s2_z + tilt**2)
            import os as _os

            if _os.environ.get("OVP_DEBUG_SIGMA") == "1":
                jax.debug.print(
                    "[sigma-msckf] plane={p} F={f} s_z={z:.4f} s_lat={l:.3f} "
                    "d={d:.2f} tilt={t:.4f} sigma_eff={s:.4f} valid={v}",
                    p=plane, f=F_n, z=jnp.sqrt(s2_z), l=jnp.sqrt(s2_lat),
                    d=d_pl, t=tilt, s=sigma_c_run, v=valid)

        def jac_one(uv_f, m_f, pf):
            return feature_jacobian_full(
                lay, opts.base.jac, clones, uv_f, m_f, pf, pf, cp, cp,
                jnp.asarray(True), jnp.asarray(False), jnp.zeros((), jnp.int32),
                opts.base.sigma_px, sigma_c_run,
            )

        H_x, H_f, res, rmask = jax.vmap(jac_one)(uv, masks, p_f)
        okf = fvalid.astype(dtype)
        H_x = H_x * okf[:, None, None] * valid
        H_f = H_f * okf[:, None, None] * valid
        res = res * okf[:, None] * valid

        # Per-feature nullspace of the point columns, carrying [H_cp | H_x | res].
        def proj_one(hx, hf, r):
            stacked = jnp.concatenate([hf[:, 3:6], hx, r[:, None]], axis=1)
            out, _ = ekf.nullspace_project(hf[:, 0:3], stacked, r)
            return out

        proj = jax.vmap(proj_one)(H_x, H_f, res)              # [Mp, 3K-3, 3+D+1]
        big = proj.reshape(Mp * (3 * K - 3), 3 + D + 1)
        # Compress, then marginalize the CP columns entirely.
        if opts.base.use_info_compression:
            bigc = ekf.info_compress_rows(big)
        else:
            bigc, _ = ekf.measurement_compress(big, jnp.zeros((big.shape[0],), dtype))
        Hcp_c, rest = bigc[:, 0:3], bigc[:, 3:]
        rest2, _ = ekf.nullspace_project(Hcp_c, rest, jnp.zeros((rest.shape[0],), dtype))
        H_up = rest2[:, :D]
        res_up = rest2[:, D]

        # Gate against the shared pre-update covariance (the reference gates
        # each group before stacking, UpdaterMSCKF.cpp:606-631, with the
        # POST-projection row count as dof — res_big.rows() after the
        # per-feature point nullspaces (−3 per feature) and the CP
        # marginalization (−3), :613-619).
        n_rows = jnp.sum(rmask & fvalid[:, None])
        chi2 = ekf.innovation_chi2(state.cov, H_up, res_up, jnp.ones_like(res_up))
        dof = jnp.maximum(n_rows - 3 * jnp.sum(fvalid) - 3, 1)
        passed = chi2 <= opts.chi2_multipler * table[jnp.clip(dof, 1, table.shape[0] - 1)]
        # A degenerate group (GN blow-up, rank-deficient fit) can carry
        # non-finite rows; NaN comparisons gate it out of `passed` here, but
        # the rows must ALSO be excluded by `where` (NaN·0 = NaN would
        # otherwise poison the cross-group stack).
        finite = jnp.all(jnp.isfinite(H_up)) & jnp.all(jnp.isfinite(res_up))
        do_update = valid & passed & finite

        used_here = jnp.zeros((M + 1,), bool).at[jnp.where(fvalid, fpos, M)].set(True)[:M]
        return (jnp.where(do_update, H_up, 0.0), jnp.where(do_update, res_up, 0.0),
                do_update, valid, used_here)

    H_all, res_all, updated, valids, used = jax.vmap(group)(
        jnp.arange(opts.max_planes_per_frame)
    )
    consumed = jnp.any(valids[:, None] & used, axis=0)

    # One stacked update for every surviving group: re-compress the
    # [G·C, D] stack to D+1 whitened rows (exact — the update is invariant
    # under orthogonal row transforms and zero rows), then a single
    # EKFUpdate ≡ UpdaterMSCKF.cpp:647.
    stack = jnp.concatenate(
        [H_all.reshape(-1, D), res_all.reshape(-1)[:, None]], axis=1)
    if opts.base.use_info_compression:
        stc = ekf.info_compress_rows(stack)
    else:
        stc, _ = ekf.measurement_compress(stack, jnp.zeros((stack.shape[0],), dtype))
    H_one = stc[:, :D]
    res_one = stc[:, D]
    st_new, _ = ekf.ekf_update(state, H_one, res_one, jnp.ones_like(res_one))
    any_update = jnp.any(updated)
    state = jax.tree.map(lambda a, b: jnp.where(any_update, a, b), st_new, state)
    return state, consumed, jnp.sum(updated), n_dropped
