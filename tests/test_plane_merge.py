"""Tests for plane-id merging (StateHelper::merge_planes_and_marginalize)."""

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.models.plane_init import merge_planes
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState

LAY = StateLayout(max_clones=3, max_slam=2, max_planes=3)


def _state_with_planes():
    st = VioState.create(LAY)
    cov = np.eye(LAY.dim) * 1e-2
    st = st.replace(cov=jnp.asarray(cov))
    st = st.replace(
        plane_cp=jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.01, 2.01], [1.0, 0.0, 0.0]]),
        plane_cp_fej=jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.01, 2.01], [1.0, 0.0, 0.0]]),
        plane_id=jnp.asarray([5, 9, 7], jnp.int32),
        plane_active=jnp.asarray([True, True, True]),
    )
    return st


def test_merge_both_in_state():
    st = _state_with_planes()
    # Merge id 9 into id 5 (nearly identical planes → passes gates).
    mf = jnp.asarray([9, -1, -1, -1], jnp.int32)
    mi = jnp.asarray([5, -1, -1, -1], jnp.int32)
    st2, n = merge_planes(st, mf, mi, 0.1, 1.0, 5.0)
    assert int(n) == 1
    ids = np.asarray(st2.plane_id)
    act = np.asarray(st2.plane_active)
    assert act.tolist() == [True, False, True]
    assert ids[1] == -1
    # Old plane's covariance slot zeroed.
    c = LAY.plane_idx(1)
    assert np.allclose(np.asarray(st2.cov)[c:c + 3, :], 0.0)
    # Surviving plane was nudged toward the merged estimate.
    assert np.linalg.norm(np.asarray(st2.plane_cp[0]) - np.asarray(st.plane_cp[0])) > 1e-6


def test_merge_rename_only():
    st = _state_with_planes()
    # id 7 merges into id 42 which is NOT in the state → rename slot 2.
    mf = jnp.asarray([7, -1], jnp.int32)
    mi = jnp.asarray([42, -1], jnp.int32)
    st2, n = merge_planes(st, mf, mi, 0.1, 1.0, 5.0)
    assert int(n) == 0  # no EKF merge performed
    assert int(st2.plane_id[2]) == 42
    assert bool(st2.plane_active[2])


def test_merge_rejects_large_angle():
    st = _state_with_planes()
    # Merge id 7 (orthogonal plane) into id 5: angle gate must reject the
    # update, but the old plane is still marginalized (reference behavior).
    mf = jnp.asarray([7, -1], jnp.int32)
    mi = jnp.asarray([5, -1], jnp.int32)
    st2, n = merge_planes(st, mf, mi, 0.1, 1.0, 5.0)
    assert int(n) == 0
    assert not bool(st2.plane_active[2])
    # Survivor unchanged (no update applied).
    np.testing.assert_allclose(np.asarray(st2.plane_cp[0]), np.asarray(st.plane_cp[0]), atol=1e-12)
