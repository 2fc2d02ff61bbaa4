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

    The jitter scales with dtype: forming HᵀH in f32 perturbs the smallest
    eigenvalues by ~ε_f32·‖H‖², so the f32 path needs ε ≈ 1e-6·tr(Λ)/d to
    stay PSD (without it the Cholesky NaNs on ill-conditioned stacks).
    """
    d = lam.shape[0]
    rel = 1e-6 if lam.dtype == jnp.float32 else 1e-12
    eps = rel * jnp.maximum(jnp.trace(lam) / d, 1.0) + jitter
    L = jnp.linalg.cholesky(lam + eps * jnp.eye(d, dtype=lam.dtype))
    # NaN-safe: if the factorization still failed, fall back to zero
    # information (the update becomes a no-op rather than poisoning the state).
    bad = ~jnp.all(jnp.isfinite(L))
    L = jnp.where(bad, jnp.eye(d, dtype=lam.dtype), L)
    R = jnp.where(bad, 0.0, L.T)
    y = jnp.where(bad, 0.0, solve_triangular(L, eta, lower=True))
    return R, y


def sharded_compress(H_shard: jnp.ndarray, r_shard: jnp.ndarray, axis_name: str):
    """Inside shard_map/pmap: reduce this shard's rows with all peers.

    Returns the (replicated) compressed (R, y).
    """
    lam, eta = local_information(H_shard, r_shard)
    lam = jax.lax.psum(lam, axis_name)
    eta = jax.lax.psum(eta, axis_name)
    return information_to_compressed(lam, eta)
