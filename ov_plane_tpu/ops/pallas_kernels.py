"""Pallas TPU kernels for the dense hot ops of the filter.

The measurement-compression path is the single biggest dense computation per
frame: the stacked whitened Jacobian H [M, D] (M up to ~2k rows, D ≈ 150-300)
must be reduced before the Kalman update. In information form that is one
fused pass

    Λ = Hᵀ H      (D×D, MXU)
    η = Hᵀ r      (D,   MXU)

:func:`gram_reduce` computes both in a single Pallas kernel, tiled over the
row dimension with a float32 VMEM accumulator — one read of H instead of two,
and the row tiles stream through VMEM (double-buffered by the Pallas
pipeline). Masked (zero) rows contribute nothing by construction.

Used by parallel/schur (the sharded reduction) and available to the updaters
as the compression front-end: chol(Λ)ᵀ is information-equivalent to the QR
R-factor (see parallel/schur.information_to_compressed).

Falls back to plain XLA on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel_batched(h_ref, r_ref, lam_ref, eta_ref, acc_lam, acc_eta):
    """Grid (batch, row-tiles): same accumulator pattern per batch element.

    The batch axis is the OUTER grid dimension, so the row-tile loop
    completes (and flushes the accumulators) before the next batch element
    starts.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_lam[:] = jnp.zeros_like(acc_lam)
        acc_eta[:] = jnp.zeros_like(acc_eta)

    h = h_ref[0]                                    # [TM, D]
    r = r_ref[0]                                    # [TM, 1]
    acc_lam[:] += jax.lax.dot_general(
        h, h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc_eta[:] += jax.lax.dot_general(
        h, r, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        lam_ref[0] = acc_lam[:]
        eta_ref[0] = acc_eta[:]


def _gram_call_batched(Hp: jnp.ndarray, rp: jnp.ndarray, tile_m: int):
    """Raw batched pallas call on padded arrays: Hp [B, Mp, Dp], rp [B, Mp, 1]."""
    B, Mp, Dp = Hp.shape
    grid = (B, Mp // tile_m)
    # Index maps return jnp.int32(0), not the Python literal 0: under
    # JAX_ENABLE_X64 the literal traces as an i64 constant and the index-map
    # function fails Mosaic legalization on the axon remote-AOT path
    # ("func.return (i32, i32, i64)" — measured round 2).
    zero = lambda: jnp.int32(0)
    return pl.pallas_call(
        _gram_kernel_batched,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, Dp), lambda b, i: (b, i, zero()), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 1), lambda b, i: (b, i, zero()), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Dp, Dp), lambda b, i: (b, zero(), zero()), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, 1), lambda b, i: (b, zero(), zero()), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Dp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Dp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dp, Dp), jnp.float32),
            pltpu.VMEM((Dp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Mp * Dp * (Dp + 1),
            bytes_accessed=4 * B * (Mp * Dp + Dp * Dp + Mp + Dp),
            transcendentals=0,
        ),
    )(Hp, rp)


@functools.lru_cache(maxsize=None)
def _gram_core(tile_m: int):
    """custom_vmap'd padded-core: vmapping it (the bench's MC batch) maps onto
    the natively batched kernel with our own Python-int index maps, instead of
    pallas's auto-batching rule (whose synthesized index maps pick up i64
    literals under JAX_ENABLE_X64 and fail Mosaic legalization on the axon
    remote-AOT path — measured round 1/2)."""

    @jax.custom_batching.custom_vmap
    def core(Hp, rp):
        lam, eta = _gram_call_batched(Hp[None], rp[None], tile_m)
        return lam[0], eta[0]

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, Hp, rp):
        if not in_batched[0]:
            Hp = jnp.broadcast_to(Hp, (axis_size, *Hp.shape))
        if not in_batched[1]:
            rp = jnp.broadcast_to(rp, (axis_size, *rp.shape))
        lam, eta = _gram_call_batched(Hp, rp, tile_m)
        return (lam, eta), (True, True)

    return core


@functools.partial(jax.jit, static_argnames=("tile_m",))
def gram_reduce_pallas(H: jnp.ndarray, r: jnp.ndarray, tile_m: int = 256):
    """Fused (Λ, η) = (HᵀH, Hᵀr) on TPU via Pallas. H [M, D] f32, r [M]."""
    M, D = H.shape
    Dp = _round_up(D, 128)
    Mp = _round_up(M, tile_m)
    Hp = jnp.zeros((Mp, Dp), jnp.float32).at[:M, :D].set(H.astype(jnp.float32))
    rp = jnp.zeros((Mp, 1), jnp.float32).at[:M, 0].set(r.astype(jnp.float32))
    lam, eta = _gram_core(tile_m)(Hp, rp)
    return lam[:D, :D].astype(H.dtype), eta[:D, 0].astype(H.dtype)


# ---------------------------------------------------------------------------
# Rank-k covariance downdate: (P', dx) = (P − WᵀW, Wᵀu)
# ---------------------------------------------------------------------------
#
# The back half of the square-root Kalman update (ops/ekf.kalman_update;
# reference StateHelper.cpp:121-202 forms K(HP) explicitly instead): after the
# triangular solves produce W = L⁻¹(HP) [M, D] and u = L⁻¹res [M], the
# covariance downdate and the state correction both contract over the same W.
# Fusing them reads W once (instead of twice) and keeps the Gram accumulator
# in VMEM — the update chain is HBM-bound at D ≈ 100-300 (BASELINE.md
# bottleneck analysis), so the saved pass is the lever.


def _downdate_kernel_batched(cov_ref, w_ref, u_ref, newcov_ref, dx_ref,
                             acc_lam, acc_eta):
    """Grid (batch, row-tiles): accumulate WᵀW / Wᵀu, apply at the last tile."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_lam[:] = jnp.zeros_like(acc_lam)
        acc_eta[:] = jnp.zeros_like(acc_eta)

    w = w_ref[0]                                    # [TM, D]
    u = u_ref[0]                                    # [TM, 1]
    acc_lam[:] += jax.lax.dot_general(
        w, w, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc_eta[:] += jax.lax.dot_general(
        w, u, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        newcov_ref[0] = cov_ref[0] - acc_lam[:]
        dx_ref[0] = acc_eta[:]


def _downdate_call_batched(covp: jnp.ndarray, Wp: jnp.ndarray, up: jnp.ndarray,
                           tile_m: int):
    """Raw batched call on padded arrays: covp [B,Dp,Dp], Wp [B,Mp,Dp], up [B,Mp,1]."""
    B, Mp, Dp = Wp.shape
    grid = (B, Mp // tile_m)
    zero = lambda: jnp.int32(0)  # literal 0 traces i64 under x64 (see above)
    return pl.pallas_call(
        _downdate_kernel_batched,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Dp, Dp), lambda b, i: (b, zero(), zero()), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, Dp), lambda b, i: (b, i, zero()), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 1), lambda b, i: (b, i, zero()), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Dp, Dp), lambda b, i: (b, zero(), zero()), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, 1), lambda b, i: (b, zero(), zero()), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Dp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Dp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dp, Dp), jnp.float32),
            pltpu.VMEM((Dp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Mp * Dp * (Dp + 1),
            bytes_accessed=4 * B * (Mp * Dp + 2 * Dp * Dp + Mp + Dp),
            transcendentals=0,
        ),
    )(covp, Wp, up)


@functools.lru_cache(maxsize=None)
def _downdate_core(tile_m: int):
    """custom_vmap'd padded core (same rationale as _gram_core)."""

    @jax.custom_batching.custom_vmap
    def core(covp, Wp, up):
        nc, dx = _downdate_call_batched(covp[None], Wp[None], up[None], tile_m)
        return nc[0], dx[0]

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, covp, Wp, up):
        if not in_batched[0]:
            covp = jnp.broadcast_to(covp, (axis_size, *covp.shape))
        if not in_batched[1]:
            Wp = jnp.broadcast_to(Wp, (axis_size, *Wp.shape))
        if not in_batched[2]:
            up = jnp.broadcast_to(up, (axis_size, *up.shape))
        nc, dx = _downdate_call_batched(covp, Wp, up, tile_m)
        return (nc, dx), (True, True)

    return core


@functools.partial(jax.jit, static_argnames=("tile_m",))
def kalman_downdate_pallas(cov: jnp.ndarray, W: jnp.ndarray, u: jnp.ndarray,
                           tile_m: int = 256):
    """Fused (P − WᵀW, Wᵀu) on TPU via Pallas. cov [D,D], W [M,D], u [M] f32.

    Zero-padded rows of W contribute nothing; the padded cov block is sliced
    back to [D, D] so pad lanes never reach the caller.
    """
    M, D = W.shape
    Dp = _round_up(D, 128)
    Mp = _round_up(M, tile_m)
    covp = jnp.zeros((Dp, Dp), jnp.float32).at[:D, :D].set(cov.astype(jnp.float32))
    Wp = jnp.zeros((Mp, Dp), jnp.float32).at[:M, :D].set(W.astype(jnp.float32))
    up = jnp.zeros((Mp, 1), jnp.float32).at[:M, 0].set(u.astype(jnp.float32))
    nc, dx = _downdate_core(tile_m)(covp, Wp, up)
    return nc[:D, :D].astype(cov.dtype), dx[:D, 0].astype(cov.dtype)


import os

_DISABLE_PALLAS = os.environ.get("OVP_DISABLE_PALLAS", "0") == "1"


# Below this row count the fused kernel loses: padding W to a full row tile
# costs more HBM traffic (materialize + read Mp rows) than the saved second
# read of W, and Mosaic fixed overhead dominates (ADVICE round 2). The
# plane-init 3-row updates, ZUPT, and small compressed updates take the plain
# XLA path; only genuinely stacked updates (M >= ~64) dispatch to Pallas.
_MIN_PALLAS_ROWS = 64


def _pallas_ok(dtype) -> bool:
    """Trace-time dispatch: Pallas on an accelerator-default process, f32 only.

    NOTE this keys on jax.default_backend() at TRACE time, not the committed
    device of the operands: in a mixed "axon,cpu" process an f32 EKF update
    traced for a CPU-committed computation would stage a Mosaic custom call
    that cannot lower on CPU. All entry points keep f32 filter math on the
    accelerator (CPU work runs f64, which takes the XLA branch); keep it that
    way, or set OVP_DISABLE_PALLAS=1.
    """
    return (_HAVE_PALLAS and not _DISABLE_PALLAS
            and jax.default_backend() in ("tpu", "axon") and dtype == jnp.float32)


def kalman_downdate(cov: jnp.ndarray, W: jnp.ndarray, u: jnp.ndarray):
    """(P − WᵀW, Wᵀu) with the fused Pallas kernel on TPU, plain XLA elsewhere."""
    M = W.shape[0]
    if _pallas_ok(cov.dtype) and M >= _MIN_PALLAS_ROWS:
        return kalman_downdate_pallas(cov, W, u, tile_m=min(256, _round_up(M, 8)))
    return cov - W.T @ W, W.T @ u


def gram_reduce(H: jnp.ndarray, r: jnp.ndarray):
    """(Λ, η) with the Pallas kernel on TPU, plain XLA elsewhere.

    Set OVP_DISABLE_PALLAS=1 to force the XLA path. (The axon remote-AOT
    helper lowers these Mosaic calls since the index maps were pinned to
    i32 — measured in-program on the v5e, round 2.)
    """
    M = H.shape[0]
    if _pallas_ok(H.dtype) and M >= _MIN_PALLAS_ROWS:
        return gram_reduce_pallas(H, r, tile_m=min(256, _round_up(M, 8)))
    return H.T @ H, H.T @ r
