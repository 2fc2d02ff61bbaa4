"""Device-resident feature track table.

Functional replacement for ov_core's ``FeatureDatabase`` (heap map of Feature
objects with per-camera timestamp/uv vectors — SURVEY.md §2.3): a fixed-
capacity structure-of-arrays keyed by clone *slot* instead of timestamp.
Because observations are stored per clone slot, they age out exactly when the
corresponding clone is marginalized (the reference's
``cleanup_measurements(margtime)`` becomes "clear one column").

Id matching and slot allocation are O(O·F) masked ops — no host round trips,
the whole ingest is inside the jitted frame step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class FeatureBank:
    fid: jnp.ndarray       # [F] int32 feature id, -1 = free slot
    uv: jnp.ndarray        # [F, K, 2] distorted pixel observations per clone slot
    uvn: jnp.ndarray       # [F, K, 2] normalized undistorted observations
    mask: jnp.ndarray      # [F, K] bool observation validity
    planeid: jnp.ndarray   # [F] int32 current plane association (-1 none)
    is_slam: jnp.ndarray   # [F] bool feature is a SLAM landmark state
    slam_slot: jnp.ndarray  # [F] int32 slam state slot if is_slam
    # Simulation ground truth (use_groundtruths injection, zeros otherwise).
    gt_p: jnp.ndarray      # [F, 3] true feature position
    gt_cp: jnp.ndarray     # [F, 3] true plane CP of the feature's plane

    @classmethod
    def create(cls, max_features: int, max_clones: int, dtype=jnp.float64) -> "FeatureBank":
        F, K = max_features, max_clones
        return cls(
            fid=jnp.full((F,), -1, jnp.int32),
            uv=jnp.zeros((F, K, 2), dtype),
            uvn=jnp.zeros((F, K, 2), dtype),
            mask=jnp.zeros((F, K), bool),
            planeid=jnp.full((F,), -1, jnp.int32),
            is_slam=jnp.zeros((F,), bool),
            slam_slot=jnp.full((F,), -1, jnp.int32),
            gt_p=jnp.zeros((F, 3), dtype),
            gt_cp=jnp.zeros((F, 3), dtype),
        )

    @property
    def active(self):
        return self.fid >= 0

    @property
    def n_obs(self):
        return jnp.sum(self.mask, axis=1)


@jax.jit
def clear_clone_column(bank: FeatureBank, slot) -> FeatureBank:
    """Remove all observations tied to a recycled/marginalized clone slot, and
    free features left with no observations (unless they are SLAM states)."""
    mask = bank.mask.at[:, slot].set(False)
    gone = (jnp.sum(mask, axis=1) == 0) & bank.active & ~bank.is_slam
    return bank.replace(
        mask=mask,
        fid=jnp.where(gone, -1, bank.fid),
        planeid=jnp.where(gone, -1, bank.planeid),
    )


@jax.jit
def ingest(bank: FeatureBank, ids, uv, uvn, plane, slot,
           gt_p=None, gt_cp=None) -> FeatureBank:
    """Insert one frame's observations at clone slot `slot`.

    ids: [O] int32 (-1 padding); uv/uvn: [O, 2]; plane: [O] int32.
    Existing ids update in place (and refresh the plane association — the
    reference's plane_check_old_feats semantics); new ids claim free slots in
    order; overflow observations are dropped. Optional per-observation ground
    truth (use_groundtruths) is stored alongside.

    Subsumes ``clear_clone_column(bank, slot)``: any stale observations at the
    recycled clone slot are dropped and obs-less non-SLAM rows freed before
    matching, so callers need no separate clear pass.

    Gather formulation (round 3): the original wrote each observation into its
    bank row with 7 scatters over the [F, K, ...] arrays, each through a
    concatenated dump row (a full HBM copy per array); TPU scatters also
    serialize per update. Ingest + triage measured 46 ms of a 148 ms step at
    batch 64 (BASELINE.md round-2 per-stage table). Instead compute, for every
    bank ROW, which observation (if any) lands on it — O(F·O) int32
    comparisons — then build the new slot column with per-row gathers and one
    dynamic_update_slice per array.
    """
    F = bank.fid.shape[0]
    O = ids.shape[0]
    valid = ids >= 0

    # Fused clear of the recycled slot column: drop stale observations and
    # free rows left with no observations (unless SLAM states).
    mask_pre = jax.lax.dynamic_update_index_in_dim(
        bank.mask, jnp.zeros((F,), bool), slot, axis=1)
    gone = ~jnp.any(mask_pre, axis=1) & bank.active & ~bank.is_slam
    fid_pre = jnp.where(gone, -1, bank.fid)
    planeid_pre = jnp.where(gone, -1, bank.planeid)

    # Existing-id matches: eq[o, f].
    eq = (ids[:, None] == fid_pre[None, :]) & (fid_pre >= 0)[None, :]  # [O, F]
    has_match = jnp.any(eq, axis=1)

    # Allocate free rows for new observations, in order: the r-th new
    # observation claims the r-th free row (rank matching is a bijection
    # between the first min(n_free, n_new) of each; overflow obs match no
    # row and are dropped).
    is_new = valid & ~has_match               # [O]
    free = fid_pre < 0                        # [F]
    free_rank = jnp.cumsum(free) - 1          # [F]
    new_rank = jnp.cumsum(is_new) - 1         # [O]
    alloc = free[:, None] & is_new[None, :] & (free_rank[:, None] == new_rank[None, :])  # [F, O]

    hit_of = eq.T | alloc                     # [F, O]: row f receives obs o
    hit = jnp.any(hit_of, axis=1)             # [F]
    src = jnp.argmax(hit_of, axis=1)          # [F] obs index feeding each row
    is_new_row = jnp.any(alloc, axis=1)       # [F]

    if gt_p is None:
        gt_p = jnp.zeros((O, 3), bank.uv.dtype)
    if gt_cp is None:
        gt_cp = jnp.zeros((O, 3), bank.uv.dtype)

    hitc = hit[:, None]
    fid = jnp.where(is_new_row, ids[src], fid_pre)
    planeid = jnp.where(hit, plane[src], planeid_pre)
    mask = jax.lax.dynamic_update_index_in_dim(mask_pre, hit, slot, axis=1)
    uv_all = jax.lax.dynamic_update_index_in_dim(
        bank.uv, jnp.where(hitc, uv[src], 0.0), slot, axis=1)
    uvn_all = jax.lax.dynamic_update_index_in_dim(
        bank.uvn, jnp.where(hitc, uvn[src], 0.0), slot, axis=1)
    gt_p_all = jnp.where(hitc, gt_p[src], bank.gt_p)
    gt_cp_all = jnp.where(hitc, gt_cp[src], bank.gt_cp)

    return bank.replace(fid=fid, uv=uv_all, uvn=uvn_all, mask=mask, planeid=planeid,
                        gt_p=gt_p_all, gt_cp=gt_cp_all)


@jax.jit
def free_rows(bank: FeatureBank, rows_mask) -> FeatureBank:
    """Free the masked rows (feature used in an update → to_delete semantics)."""
    return bank.replace(
        fid=jnp.where(rows_mask, -1, bank.fid),
        mask=bank.mask & ~rows_mask[:, None],
        planeid=jnp.where(rows_mask, -1, bank.planeid),
        is_slam=bank.is_slam & ~rows_mask,
        slam_slot=jnp.where(rows_mask, -1, bank.slam_slot),
    )
