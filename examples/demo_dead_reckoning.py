"""Drive the public library surface: IMU propagation + cloning + EKF update.

A stationary IMU (gyro = 0, accel = +g) is propagated for a few frames with
stochastic cloning, then a position pseudo-measurement is applied. Healthy
output: near-zero drift, chi2 ~ O(1), covariance contracting, clone window
management behaving.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import setup_cache

setup_cache()

from ov_plane_tpu.ops import ekf
from ov_plane_tpu.state import StateLayout, VioState
from ov_plane_tpu.state.propagator import (
    PropagatorOptions,
    marginalize_oldest_clone,
    propagate_and_clone,
)


def main():
    lay = StateLayout(max_clones=5, max_slam=4, max_planes=2)
    st = VioState.create(lay)
    st = st.replace(cov=jnp.eye(lay.dim) * 1e-4, t=jnp.asarray(0.0))
    noises = jnp.asarray([1.7e-4**2, 2e-3**2, 1.9e-5**2, 3e-3**2])
    g = jnp.asarray([0.0, 0.0, 9.81])
    opts = PropagatorOptions()

    t0 = time.time()
    for k in range(3):
        ts = jnp.asarray(np.arange(k * 0.1, (k + 1) * 0.1 + 0.011, 0.01))
        w = jnp.zeros((len(ts), 3))
        a = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (len(ts), 1))
        st, slot = propagate_and_clone(st, ts, w, a, (k + 1) * 0.1, noises, g, opts)
        print(
            f"frame {k}: t={float(st.t):.2f} clone_slot={int(slot)} "
            f"n_clones={int(st.num_clones)} p={np.asarray(st.imu[4:7]).round(6)}"
        )
    print(f"[{time.time()-t0:.1f}s incl. compile]")

    H = jnp.zeros((3, lay.dim)).at[:, lay.IMU_P : lay.IMU_P + 3].set(jnp.eye(3))
    res = -st.imu[4:7]
    st2, chi2 = ekf.ekf_update(st, H, res, jnp.full(3, 1e-4))
    print(
        f"update: chi2={float(chi2):.3f} p_after={np.asarray(st2.imu[4:7]).round(8)} "
        f"cov_p_diag={np.asarray(jnp.diag(st2.cov)[3:6]).round(9)}"
    )
    st3 = marginalize_oldest_clone(st2, 2)
    print(f"marg: n_clones={int(st3.num_clones)} (budget 2)")
    drift = float(jnp.linalg.norm(st.imu[4:7]))
    print(f"drift over 0.3s stationary: {drift:.2e} m")
    assert drift < 1e-6, "stationary dead-reckoning drifted"
    assert int(st3.num_clones) == 2
    print("OK")


if __name__ == "__main__":
    main()
