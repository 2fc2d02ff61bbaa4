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


def test_gram_reduce_fallback_cpu():
    H = jnp.asarray(RNG.normal(size=(64, 24)))
    r = jnp.asarray(RNG.normal(size=(64,)))
    lam, eta = pk.gram_reduce(H, r)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(H.T @ H), atol=1e-12)
    np.testing.assert_allclose(np.asarray(eta), np.asarray(H.T @ r), atol=1e-12)
