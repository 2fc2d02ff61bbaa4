"""Device-resident persistent plane-map: voxel-deduplicated point blocks with
batched KNN, shardable across a device mesh.

The BASELINE.json north-star component ("replace the ikd-tree plane map …
with vectorized map-block data structures partitioned across a multi-host TPU
pod slice", SURVEY.md §2.4): a fixed-capacity structure-of-arrays point store
where

* insertion voxel-deduplicates against the live set (one point per voxel at
  the downsample resolution — the ikd-tree's downsample-on-insert) and
  recycles the oldest slots when full (ring);
* KNN is a dense masked distance computation + `lax.top_k` — at map scales
  (≤ 100k points) brute force on the TPU beats any tree;
* under a mesh, points shard over an axis; sharded KNN = shard-local top-k
  followed by a global top-k over the gathered per-shard candidates — one
  `all_gather` of k·Q scalars per query batch.

Used for the persistent plane map (rpng_plane config 4) and the per-plane
spatial z-test at scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MapBlocks:
    points: jnp.ndarray    # [N, 3]
    plane_id: jnp.ndarray  # [N] int32 (-1 free)
    vox: jnp.ndarray       # [N] int64 voxel key of each point
    stamp: jnp.ndarray     # [N] int32 insertion counter (for ring recycling)
    cursor: jnp.ndarray    # scalar int32 monotonic counter
    voxel: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def create(cls, capacity: int, voxel: float = 0.1, dtype=jnp.float32) -> "MapBlocks":
        return cls(
            points=jnp.zeros((capacity, 3), dtype),
            plane_id=jnp.full((capacity,), -1, jnp.int32),
            vox=jnp.zeros((capacity,), jnp.int64),
            stamp=jnp.zeros((capacity,), jnp.int32),
            cursor=jnp.zeros((), jnp.int32),
            voxel=voxel,
        )

    @property
    def active(self):
        return self.plane_id >= 0


def _voxel_key(pts, voxel):
    q = jnp.floor(pts / voxel).astype(jnp.int64)
    return q[:, 0] * 73856093 + q[:, 1] * 19349669 + q[:, 2] * 83492791


@jax.jit
def insert(m: MapBlocks, pts, plane_ids, mask):
    """Insert masked points with voxel dedup; oldest slots recycle when full."""
    keys = _voxel_key(pts, m.voxel)
    # Dedup vs existing live voxels.
    occupied = (keys[:, None] == m.vox[None, :]) & m.active[None, :]
    dup_exist = jnp.any(occupied, axis=1)
    # Dedup within the batch (keep first per voxel).
    same = keys[:, None] == keys[None, :]
    lower = jnp.tril(jnp.ones(same.shape, bool), k=-1)
    dup_batch = jnp.any(same & lower & mask[None, :], axis=1)
    take = mask & ~dup_exist & ~dup_batch

    # Target slots: free slots first (ranked), then oldest stamps.
    N = m.points.shape[0]
    free = ~m.active
    # Priority: free slots get stamp = -1 (most recyclable).
    prio = jnp.where(free, -jnp.ones_like(m.stamp), m.stamp)
    order = jnp.argsort(prio)                     # ascending: free/oldest first
    rank = jnp.cumsum(take) - 1                   # rank of each inserted point
    B = pts.shape[0]
    slot = jnp.where(take & (rank < N), order[jnp.clip(rank, 0, N - 1)], N)

    points = jnp.concatenate([m.points, jnp.zeros((1, 3), m.points.dtype)])
    points = points.at[slot].set(jnp.where(take[:, None], pts, 0.0))[:N]
    pid = jnp.concatenate([m.plane_id, jnp.zeros((1,), jnp.int32)])
    pid = pid.at[slot].set(jnp.where(take, plane_ids, 0))[:N]
    vox = jnp.concatenate([m.vox, jnp.zeros((1,), jnp.int64)])
    vox = vox.at[slot].set(jnp.where(take, keys, 0))[:N]
    new_stamp = m.cursor + 1
    stamp = jnp.concatenate([m.stamp, jnp.zeros((1,), jnp.int32)])
    stamp = stamp.at[slot].set(jnp.where(take, new_stamp, 0))[:N]
    n_inserted = jnp.sum(take & (rank < N))
    return m.replace(points=points, plane_id=pid, vox=vox, stamp=stamp, cursor=new_stamp), n_inserted


@functools.partial(jax.jit, static_argnames=("k",))
def knn(m: MapBlocks, queries, k: int, plane_filter=None):
    """Batched KNN: queries [Q, 3] → (dists [Q, k], idx [Q, k]).

    plane_filter: optional [Q] plane id — restrict neighbors to that plane
    (the per-plane z-test use case).
    """
    d2 = jnp.sum((queries[:, None, :] - m.points[None, :, :]) ** 2, axis=-1)  # [Q, N]
    valid = m.active[None, :]
    if plane_filter is not None:
        valid = valid & (m.plane_id[None, :] == plane_filter[:, None])
    d2 = jnp.where(valid, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def sharded_knn(points_shard, active_shard, queries, k: int, axis_name: str):
    """Inside shard_map: shard-local top-k, then global top-k over gathered
    candidates. queries replicated; returns replicated (dists [Q, k])."""
    d2 = jnp.sum((queries[:, None, :] - points_shard[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(active_shard[None, :], d2, jnp.inf)
    neg_local, _ = jax.lax.top_k(-d2, min(k, points_shard.shape[0]))     # [Q, k]
    all_neg = jax.lax.all_gather(neg_local, axis_name, axis=1)           # [Q, S, k]
    all_neg = all_neg.reshape(queries.shape[0], -1)
    neg, _ = jax.lax.top_k(all_neg, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0))


class PersistentPlaneMap:
    """In-loop host wrapper maintaining the device MapBlocks store during a
    replay (run_euroc --use-planes): every frame, the frontend's triangulated
    on-plane points are inserted (one fixed-width jitted device call), and map
    statistics / KNN queries / cloud dumps are served from the device store.

    TPU-native replacement for the reference's persistent ikd-tree plane map
    (ROS1Visualizer.cpp:1413-1520: accumulate on-plane points with
    downsample-on-insert across the whole run; TrackPlane.cpp:999-1058 spatial
    queries). Voxel dedup is the downsample; the ring recycles the oldest
    points when capacity is reached.
    """

    def __init__(self, capacity: int = 8192, voxel: float = 0.10,
                 frame_batch: int = 128, dtype=jnp.float32):
        self.m = MapBlocks.create(capacity, voxel, dtype)
        self.frame_batch = frame_batch
        self.n_inserted_total = 0
        self._dtype = dtype

    def add_frame(self, ids, p3, ok, feat_to_plane: dict) -> int:
        """Insert this frame's triangulated on-plane points. ids [N], p3
        [N,3], ok [N] from the whole-track triangulation; feat_to_plane maps
        feature id -> frontend plane id. Returns points inserted."""
        import numpy as np

        ids = np.asarray(ids)
        pl = np.asarray([feat_to_plane.get(int(i), -1) for i in ids], np.int32)
        m = np.asarray(ok, bool) & (pl >= 0) & (ids >= 0)
        B = self.frame_batch
        pts = np.zeros((B, 3), np.asarray(p3).dtype)
        pid = np.full(B, -1, np.int32)
        msk = np.zeros(B, bool)
        n = min(int(m.sum()), B)
        sel = np.nonzero(m)[0][:n]
        pts[:n] = np.asarray(p3)[sel]
        pid[:n] = pl[sel]
        msk[:n] = True
        self.m, n_ins = insert(self.m, jnp.asarray(pts, self._dtype),
                               jnp.asarray(pid), jnp.asarray(msk))
        n_ins = int(n_ins)
        self.n_inserted_total += n_ins
        return n_ins

    def stats(self) -> dict:
        import numpy as np

        pid = np.asarray(self.m.plane_id)
        act = pid >= 0
        return {
            "n_points": int(act.sum()),
            "n_planes": int(len(np.unique(pid[act]))),
            "n_inserted_total": int(self.n_inserted_total),
        }

    def query(self, queries, k: int = 5, plane_filter=None):
        """Batched KNN against the device store (TrackPlane z-test form)."""
        q = jnp.asarray(queries, self._dtype)
        pf = None if plane_filter is None else jnp.asarray(plane_filter, jnp.int32)
        return knn(self.m, q, k, pf)

    def cloud(self):
        """(points [N,3], plane_id [N]) of live map points (host numpy)."""
        import numpy as np

        pid = np.asarray(self.m.plane_id)
        act = pid >= 0
        return np.asarray(self.m.points)[act], pid[act]
