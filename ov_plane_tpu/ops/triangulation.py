"""Batched feature triangulation: linear init + Gauss-Newton refinement.

Equivalent of ov_core's ``FeatureInitializer`` (single_triangulation /
single_gaussnewton — used at UpdaterMSCKF.cpp:123-194; SURVEY.md §2.3), as
masked, vmappable ops:

* the linear stage is the midpoint method in the *global* frame: each bearing
  ray contributes (I − b bᵀ); the 3×3 normal system is solved in closed form
  (TPU-safe, no LU), with a closed-form symmetric-eigenvalue condition gate;
* refinement is fixed-iteration Levenberg-Marquardt on the reprojection
  residuals of all (masked) observations, vmapped over features.

Everything takes per-feature stacks of per-clone observations with a validity
mask and returns (p_FinG, valid).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ov_plane_tpu.ops.ekf import inv3


class TriangulationOptions(NamedTuple):
    min_dist: float = 0.10
    max_dist: float = 60.0
    max_cond: float = 10000.0
    refine: bool = True
    max_runs: int = 5
    init_lamda: float = 1e-3
    max_lamda: float = 1e10
    lam_mult: float = 10.0
    min_obs: int = 2


def eigvals_sym3(A):
    """Closed-form eigenvalues of a symmetric 3×3 (ascending). TPU-safe."""
    q = jnp.trace(A) / 3.0
    B = A - q * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-300))
    detB = (
        B[0, 0] * (B[1, 1] * B[2, 2] - B[1, 2] * B[2, 1])
        - B[0, 1] * (B[1, 0] * B[2, 2] - B[1, 2] * B[2, 0])
        + B[0, 2] * (B[1, 0] * B[2, 1] - B[1, 1] * B[2, 0])
    )
    r = jnp.clip(detB / (2 * p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2 * p * jnp.cos(phi)
    l3 = q + 2 * p * jnp.cos(phi + 2 * jnp.pi / 3.0)
    l2 = 3 * q - l1 - l3
    return jnp.stack([l3, l2, l1])  # ascending


def triangulate_linear(uvn, mask, R_GtoC, p_CinG, opts: TriangulationOptions):
    """Midpoint triangulation of one feature from masked observations.

    uvn: [K, 2] normalized coordinates; mask: [K]; R_GtoC: [K, 3, 3];
    p_CinG: [K, 3] camera centers. Returns (p_FinG[3], valid, cond, depths[K]).
    """
    m = mask.astype(uvn.dtype)
    bear_c = jnp.concatenate([uvn, jnp.ones_like(uvn[:, :1])], axis=1)
    bear_g = jnp.einsum("kij,kj->ki", jnp.swapaxes(R_GtoC, -1, -2), bear_c)
    bear_g = bear_g / jnp.linalg.norm(bear_g, axis=1, keepdims=True)
    eye = jnp.eye(3, dtype=uvn.dtype)
    proj = eye[None] - bear_g[:, :, None] * bear_g[:, None, :]   # [K, 3, 3]
    proj = proj * m[:, None, None]
    A = jnp.sum(proj, axis=0)
    b = jnp.einsum("kij,kj->i", proj, p_CinG)
    p = inv3(A) @ b
    eig = eigvals_sym3(A)
    cond = eig[2] / jnp.where(jnp.abs(eig[0]) < 1e-12, 1e-12, eig[0])
    # Per-observation depth gates (FeatureInitializer: min/max dist in anchor).
    depths = jnp.einsum("kij,kj->ki", R_GtoC, p[None, :] - p_CinG)[:, 2]
    n_obs = jnp.sum(mask)
    depth_ok = jnp.all(jnp.where(mask, (depths > opts.min_dist) & (depths < opts.max_dist), True))
    valid = (n_obs >= opts.min_obs) & (cond <= opts.max_cond) & depth_ok & jnp.all(jnp.isfinite(p))
    return p, valid, cond, depths


def _reproj_residuals(p, uvn, mask, R_GtoC, p_CinG):
    p_FinC = jnp.einsum("kij,kj->ki", R_GtoC, p[None, :] - p_CinG)
    z = p_FinC[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    pred = p_FinC[:, :2] / z_safe[:, None]
    r = (uvn - pred) * mask[:, None]
    return r, p_FinC, z_safe


def refine_gauss_newton(p0, uvn, mask, R_GtoC, p_CinG, opts: TriangulationOptions):
    """Fixed-iteration LM on global-3D reprojection (single_gaussnewton equivalent)."""
    dtype = p0.dtype

    def cost(p):
        r, _, _ = _reproj_residuals(p, uvn, mask, R_GtoC, p_CinG)
        return jnp.sum(r * r)

    def body(carry, _):
        p, lam, c = carry
        r, p_FinC, z = _reproj_residuals(p, uvn, mask, R_GtoC, p_CinG)
        # J_i = -dproj/dpc · R_GtoC_i  (residual = meas - pred).
        dz = jnp.stack(
            [
                jnp.stack([1.0 / z, jnp.zeros_like(z), -p_FinC[:, 0] / z**2], axis=1),
                jnp.stack([jnp.zeros_like(z), 1.0 / z, -p_FinC[:, 1] / z**2], axis=1),
            ],
            axis=1,
        )                                                 # [K, 2, 3]
        J = -jnp.einsum("kab,kbc->kac", dz, R_GtoC) * mask[:, None, None]
        JtJ = jnp.einsum("kai,kaj->ij", J, J)
        Jtr = jnp.einsum("kai,ka->i", J, r)
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ))
        dp = -inv3(A) @ Jtr
        p_new = p + dp
        c_new = cost(p_new)
        better = c_new < c
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, jnp.maximum(lam / opts.lam_mult, 1e-12), jnp.minimum(lam * opts.lam_mult, opts.max_lamda))
        c = jnp.where(better, c_new, c)
        return (p, lam, c), None

    init = (p0, jnp.asarray(opts.init_lamda, dtype), cost(p0))
    (p, _, _), _ = jax.lax.scan(body, init, None, length=opts.max_runs)
    return p


@functools.partial(jax.jit, static_argnames=("opts",))
def triangulate(uvn, mask, R_GtoC, p_CinG, opts: TriangulationOptions):
    """Linear + optional GN refine for a batch of features.

    uvn: [F, K, 2], mask: [F, K], R_GtoC: [K, 3, 3] (shared clone/cam poses),
    p_CinG: [K, 3]. Returns (p_FinG[F, 3], valid[F]).
    """
    F = uvn.shape[0]
    R_b = jnp.broadcast_to(R_GtoC, (F, *R_GtoC.shape))
    p_b = jnp.broadcast_to(p_CinG, (F, *p_CinG.shape))

    def one(uvn_f, mask_f, R_f, p_f):
        p_lin, valid, cond, _ = triangulate_linear(uvn_f, mask_f, R_f, p_f, opts)
        p_lin = jnp.where(valid, p_lin, jnp.ones(3, uvn_f.dtype))  # safe dummy
        if opts.refine:
            p_ref = refine_gauss_newton(p_lin, uvn_f, mask_f, R_f, p_f, opts)
            # Re-check depths after refinement.
            depths = jnp.einsum("kij,kj->ki", R_f, p_ref[None, :] - p_f)[:, 2]
            ok = jnp.all(jnp.where(mask_f, (depths > opts.min_dist) & (depths < opts.max_dist), True))
            ok = ok & jnp.all(jnp.isfinite(p_ref))
            p_out = jnp.where(ok, p_ref, p_lin)
            return p_out, valid & ok
        return p_lin, valid

    return jax.vmap(one)(uvn, mask, R_b, p_b)
