"""Device map-block tests: voxel dedup, ring recycling, KNN vs brute force,
sharded KNN == single-device KNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ov_plane_tpu.frontend import map_blocks as mb

RNG = np.random.default_rng(13)
N_DEV = len(jax.devices())


def test_insert_dedup_and_recycle():
    m = mb.MapBlocks.create(capacity=8, voxel=0.5)
    pts = jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.1, 0.0, 0.0]])  # first two share a voxel
    ids = jnp.asarray([1, 1, 2], jnp.int32)
    m, n = mb.insert(m, pts, ids, jnp.ones(3, bool))
    assert int(n) == 2  # in-batch dedup
    # Re-inserting the same voxel is a no-op.
    m, n2 = mb.insert(m, pts[:1], ids[:1], jnp.ones(1, bool))
    assert int(n2) == 0
    # Fill beyond capacity: oldest recycle.
    far = jnp.asarray(RNG.uniform(5, 50, size=(10, 3)))
    m, n3 = mb.insert(m, far, jnp.full(10, 3, jnp.int32), jnp.ones(10, bool))
    assert int(jnp.sum(m.active)) == 8
    assert int(n3) == 8


def test_knn_matches_bruteforce():
    pts = RNG.normal(size=(200, 3)).astype(np.float32) * 3
    m = mb.MapBlocks.create(capacity=256, voxel=1e-3)
    m, n = mb.insert(m, jnp.asarray(pts), jnp.zeros(200, jnp.int32), jnp.ones(200, bool))
    assert int(n) == 200
    q = RNG.normal(size=(5, 3)).astype(np.float32) * 3
    d, idx = mb.knn(m, jnp.asarray(q), 4)
    for i in range(5):
        live = np.asarray(m.points)[np.asarray(m.active)]
        brute = np.sort(np.linalg.norm(live - q[i], axis=1))[:4]
        np.testing.assert_allclose(np.asarray(d[i]), brute, rtol=1e-5, atol=1e-5)


def test_knn_plane_filter():
    pts = np.vstack([np.zeros((4, 3)) + [0, 0, 1], np.zeros((4, 3)) + [5, 5, 5]]).astype(np.float32)
    pts += 0.01 * RNG.normal(size=pts.shape).astype(np.float32)
    ids = np.asarray([1, 1, 1, 1, 2, 2, 2, 2], np.int32)
    m = mb.MapBlocks.create(capacity=16, voxel=1e-4)
    m, _ = mb.insert(m, jnp.asarray(pts), jnp.asarray(ids), jnp.ones(8, bool))
    q = jnp.asarray([[0.0, 0.0, 1.0]])
    d2, idx2 = mb.knn(m, q, 3, plane_filter=jnp.asarray([2], jnp.int32))
    # All neighbors must come from plane 2 (the far cluster).
    assert float(d2.min()) > 5.0


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_knn_matches_single_device():
    n_per = 32
    pts = RNG.normal(size=(N_DEV * n_per, 3)).astype(np.float64) * 2
    active = np.ones(N_DEV * n_per, bool)
    active[3] = False
    q = RNG.normal(size=(6, 3)).astype(np.float64)
    k = 5

    mesh = Mesh(np.array(jax.devices()), axis_names=("shard",))
    f = shard_map(
        lambda p, a, qq: mb.sharded_knn(p, a, qq, k, "shard"),
        mesh=mesh,
        in_specs=(P("shard", None), P("shard"), P()),
        out_specs=P(),
        check_rep=False,  # replication holds post-all_gather but isn't inferable
    )
    d_sh = np.asarray(jax.jit(f)(jnp.asarray(pts), jnp.asarray(active), jnp.asarray(q)))
    for i in range(len(q)):
        brute = np.sort(np.linalg.norm(pts[active] - q[i], axis=1))[:k]
        np.testing.assert_allclose(d_sh[i], brute, atol=1e-9)


def test_persistent_map_inloop_insert_query_recycle():
    """In-loop maintenance (run_euroc --use-planes wiring): frames of
    triangulated on-plane points stream in, dedup on voxels, serve KNN, and
    recycle the oldest slots at capacity."""
    import numpy as np

    from ov_plane_tpu.frontend.map_blocks import PersistentPlaneMap

    rng = np.random.default_rng(5)
    pm = PersistentPlaneMap(capacity=64, voxel=0.25, frame_batch=32)
    ids = np.arange(24)

    # Two walls: z=2 (plane 1), x=3 (plane 2).
    for frame in range(12):
        p3 = np.empty((24, 3))
        p3[:12] = np.c_[rng.uniform(-2, 2, 12), rng.uniform(-2, 2, 12), np.full(12, 2.0)]
        p3[12:] = np.c_[np.full(12, 3.0), rng.uniform(-2, 2, 12), rng.uniform(0, 4, 12)]
        ok = np.ones(24, bool)
        ok[::7] = False  # some invalid triangulations
        f2p = {int(i): (1 if i < 12 else 2) for i in ids}
        del f2p[3]  # an on-view feature with no plane
        pm.add_frame(ids, p3, ok, f2p)

    st = pm.stats()
    assert st["n_planes"] == 2
    # Voxel dedup engaged: far fewer live points than raw insert attempts.
    assert st["n_inserted_total"] < 12 * 24
    # Capacity ring: never exceeds capacity, and with 12 frames of fresh
    # random points the store is saturated.
    assert st["n_points"] == 64

    # KNN serves from the device store: a query on the z=2 wall finds wall
    # points within the voxel scale, restricted per plane.
    d, idx = pm.query(np.array([[0.0, 0.0, 2.0], [3.0, 0.0, 2.0]]), k=3,
                      plane_filter=np.array([1, 2], np.int32))
    d = np.asarray(d)
    assert np.all(np.isfinite(d)) and d.max() < 2.0
    pts, pid = pm.cloud()
    assert pts.shape[0] == 64 and set(np.unique(pid)) == {1, 2}

    # Recycling keeps the NEWEST points: insert a distinct new batch filling
    # more than capacity; the oldest stamps must be gone.
    old_stamp_min = int(np.asarray(pm.m.stamp).min())
    for frame in range(12):
        p3 = np.c_[rng.uniform(5, 9, 24), rng.uniform(5, 9, 24), np.full(24, -1.0)]
        pm.add_frame(ids, p3, np.ones(24, bool), {int(i): 9 for i in ids})
    assert int(np.asarray(pm.m.stamp).min()) > old_stamp_min
