"""Pallas kernel tests: interpreter-mode equivalence with XLA on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ov_plane_tpu.ops import pallas_kernels as pk

RNG = np.random.default_rng(17)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
def test_gram_reduce_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    M, D = 300, 70  # unaligned on purpose (padding path)
    H = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)
    r = jnp.asarray(RNG.normal(size=(M,)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        lam, eta = pk.gram_reduce_pallas(H, r, tile_m=128)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(H.T @ H), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(eta), np.asarray(H.T @ r), rtol=2e-5, atol=2e-4)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
def test_gram_reduce_vmapped_native_batch():
    """vmap must route through the custom_vmap rule onto the natively batched
    kernel (grid (B, tiles)) — the pallas auto-batching rule synthesizes i64
    index-map literals under x64 that Mosaic cannot legalize."""
    from jax.experimental.pallas import tpu as pltpu

    B, M, D = 5, 300, 70
    H = jnp.asarray(RNG.normal(size=(B, M, D)), jnp.float32)
    r = jnp.asarray(RNG.normal(size=(B, M)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        lam, eta = jax.vmap(lambda h, rr: pk.gram_reduce_pallas(h, rr, tile_m=128))(H, r)
    np.testing.assert_allclose(np.asarray(lam), np.einsum("bmi,bmj->bij", H, H),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(eta), np.einsum("bmi,bm->bi", H, r),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
def test_kalman_downdate_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    M, D = 300, 70  # unaligned on purpose (padding path)
    cov = jnp.asarray(RNG.normal(size=(D, D)), jnp.float32)
    cov = cov @ cov.T + D * jnp.eye(D, dtype=jnp.float32)
    W = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)
    u = jnp.asarray(RNG.normal(size=(M,)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        nc, dx = pk.kalman_downdate_pallas(cov, W, u, tile_m=128)
    np.testing.assert_allclose(np.asarray(nc), np.asarray(cov - W.T @ W),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(W.T @ u),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
def test_kalman_downdate_vmapped_native_batch():
    from jax.experimental.pallas import tpu as pltpu

    B, M, D = 4, 300, 70
    cov = jnp.asarray(RNG.normal(size=(B, D, D)), jnp.float32)
    W = jnp.asarray(RNG.normal(size=(B, M, D)), jnp.float32)
    u = jnp.asarray(RNG.normal(size=(B, M)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        nc, dx = jax.vmap(lambda c, w, uu: pk.kalman_downdate_pallas(c, w, uu, tile_m=128))(cov, W, u)
    np.testing.assert_allclose(
        np.asarray(nc), np.asarray(cov) - np.einsum("bmi,bmj->bij", W, W),
        rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dx), np.einsum("bmi,bm->bi", W, u),
                               rtol=2e-5, atol=2e-4)


def test_kalman_downdate_fallback_cpu():
    cov = jnp.asarray(RNG.normal(size=(24, 24)))
    W = jnp.asarray(RNG.normal(size=(64, 24)))
    u = jnp.asarray(RNG.normal(size=(64,)))
    nc, dx = pk.kalman_downdate(cov, W, u)
    np.testing.assert_allclose(np.asarray(nc), np.asarray(cov - W.T @ W), atol=1e-12)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(W.T @ u), atol=1e-12)


def test_gram_reduce_fallback_cpu():
    H = jnp.asarray(RNG.normal(size=(64, 24)))
    r = jnp.asarray(RNG.normal(size=(64,)))
    lam, eta = pk.gram_reduce(H, r)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(H.T @ H), atol=1e-12)
    np.testing.assert_allclose(np.asarray(eta), np.asarray(H.T @ r), atol=1e-12)
