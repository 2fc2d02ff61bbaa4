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
    """
    if gt_p is None:
        gt_p = jnp.zeros((ids.shape[0], 3), bank.uv.dtype)
    if gt_cp is None:
        gt_cp = jnp.zeros((ids.shape[0], 3), bank.uv.dtype)
    F = bank.fid.shape[0]
    O = ids.shape[0]
    valid = ids >= 0

    # Match each obs to an existing bank row.
    eq = (ids[:, None] == bank.fid[None, :]) & (bank.fid >= 0)[None, :]  # [O, F]
    has_match = jnp.any(eq, axis=1)
    match_slot = jnp.argmax(eq, axis=1)

    # Allocate free rows for new observations, in order.
    is_new = valid & ~has_match
    free = bank.fid < 0
    free_rank = jnp.cumsum(free) - 1          # rank of each free row  [F]
    new_rank = jnp.cumsum(is_new) - 1         # rank of each new obs   [O]
    n_free = jnp.sum(free)
    # obs_for_rank[r] = obs index with new_rank r.
    obs_for_rank = jnp.full((O + 1,), O, jnp.int32).at[
        jnp.where(is_new, new_rank, O)
    ].set(jnp.arange(O, dtype=jnp.int32))[:O]
    # row_for_rank[r] = free row with free_rank r.
    row_for_rank = jnp.full((F + 1,), F, jnp.int32).at[
        jnp.where(free, free_rank, F)
    ].set(jnp.arange(F, dtype=jnp.int32))[:F]
    alloc_row = jnp.where(
        is_new & (new_rank < n_free),
        row_for_rank[jnp.clip(new_rank, 0, F - 1)],
        F,  # dump row
    )

    row = jnp.where(has_match, match_slot, alloc_row)
    row = jnp.where(valid, row, F).astype(jnp.int32)

    # Scatter with a dump row at index F.
    fid = jnp.concatenate([bank.fid, jnp.zeros((1,), jnp.int32)])
    fid = fid.at[row].set(jnp.where(valid, ids, 0))[:F]
    planeid = jnp.concatenate([bank.planeid, jnp.zeros((1,), jnp.int32)])
    planeid = planeid.at[row].set(jnp.where(valid, plane, 0))[:F]
    K = bank.mask.shape[1]
    mask = jnp.concatenate([bank.mask, jnp.zeros((1, K), bool)])
    mask = mask.at[row, slot].set(valid)[:F]
    uv_all = jnp.concatenate([bank.uv, jnp.zeros((1, K, 2), bank.uv.dtype)])
    uv_all = uv_all.at[row, slot].set(uv)[:F]
    uvn_all = jnp.concatenate([bank.uvn, jnp.zeros((1, K, 2), bank.uvn.dtype)])
    uvn_all = uvn_all.at[row, slot].set(uvn)[:F]
    gt_p_all = jnp.concatenate([bank.gt_p, jnp.zeros((1, 3), bank.gt_p.dtype)])
    gt_p_all = gt_p_all.at[row].set(jnp.where(valid[:, None], gt_p, 0.0))[:F]
    gt_cp_all = jnp.concatenate([bank.gt_cp, jnp.zeros((1, 3), bank.gt_cp.dtype)])
    gt_cp_all = gt_cp_all.at[row].set(jnp.where(valid[:, None], gt_cp, 0.0))[:F]

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
