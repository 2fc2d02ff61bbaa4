"""Delayed CP-plane initialization into the state + plane bookkeeping.

Re-design of ``UpdaterPlane::init_vio_plane`` (update/UpdaterPlane.cpp:61-481)
plus the plane marginalization half of ``merge_planes_and_marginalize``
(StateHelper.cpp:738-757):

* candidate planes are discovered on device: distinct frontend plane ids among
  eligible bank features (O(F²) masked equality — F is a few hundred), ranked
  by supporting-feature count, top-(free slots) processed under a bounded
  ``lax.scan``;
* per candidate: gather ≤ max_msckf_plane best features (cap,
  UpdaterPlane.cpp:189-190) → batched triangulation → LSQ plane fit with
  condition gate (plane_init_max_cond) → joint GN refine (ops/planefit) →
  stacked per-feature Jacobians with CP columns kept → per-feature nullspace
  projection of the point columns → compression → QR split on the CP columns
  → chi2 gate (const_init_chi2, noise inflation const_init_multi) →
  initialize_invertible into a free plane slot + leftover update;
* features consumed by a successful init are freed (featsup_INIT_used →
  to_delete, VioManager.cpp:591-601);
* planes with no supporting observation in the current frame are marginalized.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.jacobians import JacobianOptions, clone_set_from_state, feature_jacobian_full
from ov_plane_tpu.ops import ekf
from ov_plane_tpu.ops.planefit import (
    PlaneRansacOptions,
    PlaneRefineOptions,
    fit_plane_lsq,
    plane_ransac,
    refine_plane_joint,
)
from ov_plane_tpu.ops.triangulation import TriangulationOptions, triangulate
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils.chi2 import CHI2_095_TABLE


class PlaneInitOptions(NamedTuple):
    jac: JacobianOptions = JacobianOptions()
    tri: TriangulationOptions = TriangulationOptions()
    refine: PlaneRefineOptions = PlaneRefineOptions()
    sigma_px: float = 1.0
    sigma_c: float = 0.05
    const_init_multi: float = 5.0
    const_init_chi2: float = 1.0
    plane_init_min_feat: int = 10
    plane_init_max_cond: float = 50.0
    max_msckf_plane: int = 20
    max_inits_per_frame: int = 2
    use_refine_plane_feat: bool = True
    # RANSAC hypothesis search before the joint refine (PlaneFitting::plane_fitting
    # :83-195). Off for the noise-free simulator; on for the vision pipeline.
    use_ransac: bool = False
    ransac: PlaneRansacOptions = PlaneRansacOptions()
    # Information-form compression (gram + Cholesky ≡ thin QR's R factor for
    # full-rank stacks; rank-deficient stacks take a guarded eps-jittered
    # fallback — ekf.info_compress_rows): one MXU contraction instead of the
    # TPU's latency-bound sequential-Householder QR custom call. Plumbed from
    # tpu.use_info_compression alongside the classic-path switch.
    use_info_compression: bool = False
    # Noise-adaptive constraint whitening (tpu.sigma_c_adaptive): constraint
    # rows use sqrt(sigma_c² + mean point-to-plane residual²) of the refined
    # support, so noisy/contaminated groups weaken their own constraint.
    sigma_c_adaptive: bool = False


@functools.partial(jax.jit, static_argnames=("opts",))
def plane_delayed_init(state: VioState, bank: fb.FeatureBank, opts: PlaneInitOptions, cur_slot):
    """Try to initialize new CP plane states. Returns (state, bank, n_inited)."""
    lay = state.layout
    K = lay.max_clones
    D = lay.dim
    dtype = state.imu.dtype
    F = bank.fid.shape[0]
    Mp = opts.max_msckf_plane
    table = jnp.asarray(CHI2_095_TABLE, dtype)

    clone_active = jnp.isfinite(state.clones_t)

    # ----- candidate plane discovery --------------------------------------
    eligible = bank.active & ~bank.is_slam & (bank.planeid >= 0) & (bank.n_obs >= 2)
    pid = jnp.where(eligible, bank.planeid, -1)
    eq = (pid[:, None] == pid[None, :]) & (pid >= 0)[:, None]
    count = jnp.sum(eq, axis=1)
    lower = jnp.tril(jnp.ones((F, F), bool), k=-1)
    is_first = ~jnp.any(eq & lower, axis=1) & (pid >= 0)
    in_state = jnp.any((pid[:, None] == state.plane_id[None, :]) & state.plane_active[None, :], axis=1)
    score = jnp.where(is_first & ~in_state & (count >= opts.plane_init_min_feat), count, -1)
    cand_scores, cand_rows = jax.lax.top_k(score, opts.max_inits_per_frame)
    cand_pids = jnp.where(cand_scores > 0, pid[cand_rows], -1)

    # ----- per-candidate init under scan ----------------------------------
    def body(carry, c):
        st, bk = carry
        plane = cand_pids[c]
        valid = plane >= 0

        free = ~st.plane_active
        has_free = jnp.any(free)
        slot = jnp.argmax(free).astype(jnp.int32)
        valid = valid & has_free

        # Gather the best supporting features.
        on_plane = bk.active & ~bk.is_slam & (bk.planeid == plane) & valid
        fscore = jnp.where(on_plane, bk.n_obs, -1)
        fs, fidx = jax.lax.top_k(fscore, Mp)
        fvalid = fs >= 2

        uv = bk.uv[fidx]
        uvn = bk.uvn[fidx]
        masks = bk.mask[fidx] & fvalid[:, None] & clone_active[None, :]

        clones = clone_set_from_state(st)
        p_f, tri_ok = triangulate(uvn, masks, clones.R_GtoC, clones.p_CinG, opts.tri)
        fvalid = fvalid & tri_ok
        masks = masks & fvalid[:, None]

        # Plane fit + joint refine (PlaneFitting::plane_fitting + optimize_plane).
        if opts.use_ransac:
            # Deterministic per-candidate key (reference seeds its mt19937 with
            # a constant; we fold in the plane id for hypothesis diversity).
            rkey = jax.random.fold_in(jax.random.PRNGKey(8888), plane)
            cp_r, inl, r_ok = plane_ransac(p_f, fvalid, rkey, opts.ransac)
            fvalid = jnp.where(r_ok, fvalid & inl, fvalid)
            masks = masks & fvalid[:, None]
        cp0, cond, fit_ok = fit_plane_lsq(p_f, fvalid)
        valid = valid & fit_ok & (cond <= opts.plane_init_max_cond) & (jnp.sum(fvalid) >= opts.plane_init_min_feat)
        p_tri = p_f            # PRE-refine triangulations (honest noise scale)
        if opts.use_refine_plane_feat:
            cp, p_f2, ref_ok, inl = refine_plane_joint(
                cp0, p_f, uvn, masks, fvalid, jnp.zeros_like(fvalid),
                clones.R_GtoC, clones.p_CinG, opts.refine,
            )
            if opts.refine.max_error_threshold > 0.0:
                # Reference semantics: a failed optimize_plane ABORTS the
                # init (UpdaterPlane.cpp:261 `continue`), and only the
                # re-accepted inliers keep constraint rows
                # (PlaneFitting.cpp:452-481 prunes feats to the inlier set).
                valid = valid & ref_ok
                fvalid = fvalid & inl
                masks = masks & fvalid[:, None]
                valid = valid & (jnp.sum(fvalid) >= opts.plane_init_min_feat)
                p_f = p_f2
            else:
                cp = jnp.where(ref_ok, cp, cp0)
                p_f = jnp.where(ref_ok, p_f2, p_f)
        else:
            cp = cp0

        sigma_c_run = jnp.asarray(opts.sigma_c, dtype)
        if opts.sigma_c_adaptive:
            # Tilt-aware whitening — see plane_msckf.py: σ_eff² = σc² + σ_z²
            # + (‖cp‖·σ_z/s_lat)², charging the init for the patch-geometry
            # plane error its support can actually constrain.
            d_pl = jnp.maximum(jnp.linalg.norm(cp), 1e-9)
            n_pl = cp / d_pl
            fv = fvalid.astype(dtype)
            F_n = jnp.maximum(jnp.sum(fv), 1.0)
            r_pp = (p_tri @ n_pl - d_pl) * fv   # pre-refine scatter
            s2_z = jnp.sum(r_pp**2) / F_n
            c_lat = jnp.sum(p_f * fv[:, None], axis=0) / F_n
            rel = (p_f - c_lat) * fv[:, None]
            lat = rel - (rel @ n_pl)[:, None] * n_pl[None, :]
            s2_lat = jnp.maximum(jnp.sum(lat**2) / F_n, 1e-6)
            tilt = d_pl * jnp.sqrt(s2_z / s2_lat)
            sigma_c_run = jnp.sqrt(opts.sigma_c**2 + s2_z + tilt**2)

        # Stacked Jacobians with CP in the H_f[:,3:6] columns (not in state).
        def jac_one(uv_f, m_f, pf):
            return feature_jacobian_full(
                lay, opts.jac, clones, uv_f, m_f, pf, pf, cp, cp,
                jnp.asarray(True), jnp.asarray(False), jnp.zeros((), jnp.int32),
                opts.sigma_px, sigma_c_run,
            )

        H_x, H_f, res, rmask = jax.vmap(jac_one)(uv, masks, p_f)
        okf = fvalid.astype(dtype)
        H_x = H_x * okf[:, None, None]
        H_f = H_f * okf[:, None, None]
        res = res * okf[:, None]

        # Per-feature nullspace projection of the point columns, keeping
        # [H_cp | H_x | res] (UpdaterPlane::nullspace_project_inplace :483-517).
        def proj_one(hx, hf, r):
            stacked = jnp.concatenate([hf[:, 3:6], hx, r[:, None]], axis=1)
            out, _ = ekf.nullspace_project(hf[:, 0:3], stacked, r)
            return out

        proj = jax.vmap(proj_one)(H_x, H_f, res)          # [Mp, 3K-3, 3+D+1]
        big = proj.reshape(Mp * (3 * K - 3), 3 + D + 1)
        # Compress (UpdaterPlane::measurement_compress_inplace :519-552).
        if opts.use_info_compression:
            bigc = ekf.info_compress_rows(big)
        else:
            bigc, _ = ekf.measurement_compress(big, jnp.zeros((big.shape[0],), dtype))
        H_cp_c = bigc[:, 0:3]
        H_x_c = bigc[:, 3:3 + D]
        res_c = bigc[:, 3 + D]

        # QR split on CP columns → invertible init + update portions.
        HL_i, HR_i, res_i, HR_u, res_u = ekf.qr_init_split(H_cp_c, H_x_c, res_c)

        r_mult = jnp.asarray(opts.const_init_multi, dtype)
        n_rows = jnp.sum(rmask & fvalid[:, None])
        chi2 = ekf.innovation_chi2(st.cov, HR_u, res_u, jnp.full_like(res_u, r_mult))
        # dof = rows of the projected system fed to initialize — after the
        # per-feature point nullspaces (−3 per feature), NOT the raw
        # measurement count (StateHelper::initialize gates on res.rows() of
        # the compressed system, StateHelper.cpp:470-475).
        dof = jnp.maximum(n_rows - 3 * jnp.sum(fvalid), 1)
        passed = chi2 <= opts.const_init_chi2 * table[jnp.clip(dof, 1, table.shape[0] - 1)]
        diag_ok = jnp.all(jnp.abs(jnp.diag(HL_i)) > 1e-8)
        do_init = valid & passed & diag_ok
        # Trace-time-gated gate diagnostics (zero cost when the env is unset):
        # prints every candidate's per-gate outcome — the tool that located
        # the cond-gate knife edge this path is sensitive to.
        import os as _os

        if _os.environ.get("OVP_DEBUG_PLANE_INIT") == "1":
            pn = jnp.linalg.norm(jnp.where(fvalid[:, None], p_f, 0.0), axis=1)
            ctr = jnp.sum(jnp.where(fvalid[:, None], p_f, 0.0), axis=0) / jnp.maximum(jnp.sum(fvalid), 1)
            spread = jnp.sqrt(jnp.sum(jnp.where(fvalid[:, None], (p_f - ctr) ** 2, 0.0))
                              / jnp.maximum(jnp.sum(fvalid), 1))
            jax.debug.print(
                "[pinit] plane={p} nfeat={nf} tri_ok={nt} cond={c:.1f} fit_ok={fo} "
                "valid={v} chi2={x:.1f} thr={t:.1f} passed={pa} diag_ok={dg} "
                "pmax={pm:.2f} ctr=({c0:.2f},{c1:.2f},{c2:.2f}) spread={sp:.2f}",
                p=plane, nf=jnp.sum(on_plane), nt=jnp.sum(fvalid), c=cond, fo=fit_ok,
                v=valid, x=chi2, t=opts.const_init_chi2 * table[jnp.clip(dof, 1, table.shape[0] - 1)],
                pa=passed, dg=diag_ok, pm=jnp.max(pn),
                c0=ctr[0], c1=ctr[1], c2=ctr[2], sp=spread)

        slot_col = lay.plane_base + 3 * slot
        new_cov, dx_new = ekf.initialize_invertible(
            st, slot_col, HR_i, HL_i, jnp.full((3,), r_mult), res_i
        )
        cp_init = cp + dx_new
        st_new = st.replace(
            cov=new_cov,
            plane_cp=st.plane_cp.at[slot].set(cp_init),
            plane_cp_fej=st.plane_cp_fej.at[slot].set(cp_init),
            plane_id=st.plane_id.at[slot].set(plane),
            plane_active=st.plane_active.at[slot].set(True),
        )
        st_upd, _ = ekf.ekf_update(st_new, HR_u, res_u, jnp.full_like(res_u, r_mult))
        st_out = jax.tree.map(lambda a, b: jnp.where(do_init, a, b), st_upd, st)

        # Consume the used features.
        consumed = jnp.zeros((F + 1,), bool).at[jnp.where(fvalid, fidx, F)].set(True)[:F]
        bk_freed = fb.free_rows(bk, consumed)
        bk_out = jax.tree.map(lambda a, b: jnp.where(do_init, a, b), bk_freed, bk)
        return (st_out, bk_out), do_init

    (state, bank), inited = jax.lax.scan(body, (state, bank), jnp.arange(opts.max_inits_per_frame))
    return state, bank, jnp.sum(inited)


@jax.jit
def merge_planes(state: VioState, merge_from, merge_into, sigma_merge, merge_chi2_mult, merge_deg_max):
    """Merge frontend-combined plane ids (StateHelper::merge_planes_and_marginalize,
    StateHelper.cpp:654-736).

    merge_from/merge_into: [Q] int32 frontend plane-id pairs (-1 padding);
    each pair says "old id `from` is now id `into`". Cases per reference:

    * only `from` in state → relabel the slot id;
    * both in state → pseudo-measurement cp_new − cp_old = 0 with noise
      σ_merge, chi2 + normal-angle gated EKF update, then marginalize `from`.

    Processed under a bounded scan (each merge conditions the next).
    """
    from ov_plane_tpu.utils.chi2 import CHI2_095_TABLE

    lay = state.layout
    D = lay.dim
    dtype = state.imu.dtype
    table = jnp.asarray(CHI2_095_TABLE, dtype)
    white = 1.0 / sigma_merge

    def body(st, q):
        pid_from = merge_from[q]
        pid_into = merge_into[q]
        valid = (pid_from >= 0) & (pid_into >= 0) & (pid_from != pid_into)

        eq_f = (st.plane_id == pid_from) & st.plane_active
        eq_i = (st.plane_id == pid_into) & st.plane_active
        has_f = jnp.any(eq_f)
        has_i = jnp.any(eq_i)
        slot_f = jnp.argmax(eq_f).astype(jnp.int32)
        slot_i = jnp.argmax(eq_i).astype(jnp.int32)

        # Case 1: rename only.
        rename = valid & has_f & ~has_i
        plane_id_renamed = jnp.where(rename, st.plane_id.at[slot_f].set(pid_into), st.plane_id)

        # Case 2: both in state → gated merge update, marginalize `from`.
        both = valid & has_f & has_i
        cp_new = st.plane_cp[slot_i]
        cp_old = st.plane_cp[slot_f]
        n_new = cp_new / jnp.maximum(jnp.linalg.norm(cp_new), 1e-9)
        n_old = cp_old / jnp.maximum(jnp.linalg.norm(cp_old), 1e-9)
        angle = jnp.degrees(jnp.arccos(jnp.clip(n_new @ n_old, -1.0, 1.0)))

        res = white * (0.0 - (cp_new - cp_old))
        col_i = (lay.plane_base + 3 * slot_i).astype(jnp.int32)
        col_f = (lay.plane_base + 3 * slot_f).astype(jnp.int32)
        z0 = jnp.zeros((), jnp.int32)
        H = jnp.zeros((3, D), dtype)
        eye_w = white * jnp.eye(3, dtype=dtype)
        H = jax.lax.dynamic_update_slice(H, eye_w, (z0, col_i))
        H = jax.lax.dynamic_update_slice(H, -eye_w, (z0, col_f))
        chi2 = ekf.innovation_chi2(st.cov, H, res, jnp.ones((3,), dtype))
        pass_gate = (chi2 < merge_chi2_mult * table[3]) & (angle < merge_deg_max)

        st_upd, _ = ekf.ekf_update(st, H, res, jnp.ones((3,), dtype))
        do_update = both & pass_gate
        st1 = jax.tree.map(lambda a, b: jnp.where(do_update, a, b), st_upd, st)
        # Always marginalize the old plane when both exist (reference :732-734).
        cov_m = jnp.where(both, ekf.zero_slot(st1.cov, col_f, 3), st1.cov)
        st1 = st1.replace(
            cov=cov_m,
            plane_active=jnp.where(both, st1.plane_active.at[slot_f].set(False), st1.plane_active),
            plane_id=jnp.where(both, st1.plane_id.at[slot_f].set(-1), plane_id_renamed),
        )
        return st1, do_update

    state, merged = jax.lax.scan(body, state, jnp.arange(merge_from.shape[0]))
    return state, jnp.sum(merged)


@jax.jit
def marginalize_unseen_planes(state: VioState, bank: fb.FeatureBank, cur_slot):
    """Marginalize plane states with no supporting feature association in the
    current frame (StateHelper.cpp:738-757)."""
    lay = state.layout
    seen_feat = bank.active & bank.mask[:, cur_slot] & (bank.planeid >= 0)
    supported = jax.vmap(
        lambda pidd: jnp.any(seen_feat & (bank.planeid == pidd))
    )(state.plane_id)
    drop = state.plane_active & ~supported

    def zero_one(i, cov):
        return jnp.where(drop[i], ekf.zero_slot(cov, lay.plane_base + 3 * i, 3), cov)

    cov = jax.lax.fori_loop(0, lay.max_planes, zero_one, state.cov)
    return state.replace(
        cov=cov,
        plane_active=state.plane_active & ~drop,
        plane_id=jnp.where(drop, -1, state.plane_id),
    ), jnp.sum(drop)
