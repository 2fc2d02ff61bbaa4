"""Sharded measurement compression via information-form tree reduction.

New architecture with no reference analogue (SURVEY.md §2.4): the reference's
sequential Givens compression (UpdaterHelper.cpp:548-579) is mathematically a
QR reduction, which distributes as a `psum` of per-shard normal equations:

    shard s holds rows (H_s, r_s)  →  Λ = Σ_s H_sᵀH_s,   η = Σ_s H_sᵀr_s
    R = chol(Λ)ᵀ (upper),  y = R⁻ᵀ η
    ⇒ (R, y) is information-equivalent to the Givens/QR-compressed stacked
      system: RᵀR = HᵀH and Rᵀy = Hᵀr.

The EKF update with (R, y, I) equals the update with the full stack (H, r, I),
so feature/measurement rows can be sharded across devices (`seq` = data
parallel over sequences, `shard` = row shards within one update) with a single
collective per update. FEJ correctness is preserved because linearization
points are replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def local_information(H: jnp.ndarray, r: jnp.ndarray):
    """Per-shard normal equations (Λ_s, η_s). Masked rows must be zero."""
    return H.T @ H, H.T @ r


def information_to_compressed(lam: jnp.ndarray, eta: jnp.ndarray, jitter: float = 0.0):
    """(Λ, η) → (R upper-triangular, y) with RᵀR = Λ, Rᵀy = η.

    A zero-information system returns zeros (mask-safe): chol of Λ+εI with the
    triangular solve keeps y finite, and zero rows contribute nothing to the
    downstream Kalman update.
    """
    d = lam.shape[0]
    eps = 1e-12 * jnp.maximum(jnp.trace(lam), 1.0) + jitter
    L = jnp.linalg.cholesky(lam + eps * jnp.eye(d, dtype=lam.dtype))
    R = L.T
    y = solve_triangular(L, eta, lower=True)
    return R, y


def sharded_compress(H_shard: jnp.ndarray, r_shard: jnp.ndarray, axis_name: str):
    """Inside shard_map/pmap: reduce this shard's rows with all peers.

    Returns the (replicated) compressed (R, y).
    """
    lam, eta = local_information(H_shard, r_shard)
    lam = jax.lax.psum(lam, axis_name)
    eta = jax.lax.psum(eta, axis_name)
    return information_to_compressed(lam, eta)
