"""Data-parallel batched replay over sequences / Monte-Carlo instances.

The distributed execution layer (BASELINE.json config 5; SURVEY.md §2.4 item
1): each sequence's EKF is independent, so replay is pure data parallelism
over a `seq` mesh axis; cross-sequence aggregation (fleet metrics) is the only
collective. Works identically on a virtual CPU mesh (tests), one chip
(vmap-only), or a multi-host pod slice (jax.distributed + the same mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(axis,))


def shard_leading_axis(tree, mesh: Mesh, axis: str = "seq"):
    """Place every leaf with its leading axis sharded over the mesh."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(*([None] * x.ndim))))

    return jax.tree.map(put, tree)


def batched_replay(eng, states_b, banks_b, sim_data, imu_window: int, mesh: Mesh, axis: str = "seq"):
    """Run `run_sequence` for a sharded batch of filter instances over one
    (replicated) measurement stream; returns sharded outputs plus replicated
    fleet-mean position RMSE (the collective).
    """
    from ov_plane_tpu.models.manager import run_sequence

    @jax.jit
    def run_all(states_b, banks_b, sim_data):
        def one(st, bk):
            _, _, outs = run_sequence(eng, st, bk, sim_data, imu_window=imu_window)
            return outs

        outs = jax.vmap(one)(states_b, banks_b)
        err = outs.p - sim_data.gt_p[None, 1:]
        fleet_rmse = jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1)))
        return outs, fleet_rmse

    with mesh:
        return run_all(states_b, banks_b, sim_data)
