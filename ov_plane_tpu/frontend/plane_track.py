"""Plane detection: Delaunay normals → per-vertex averaging → pairwise
clustering with plane-id merging → spatial z-test filtering.

Host-side re-implementation of the plane half of ``TrackPlane``
(perform_plane_detection_monocular, TrackPlane.cpp:580-1121): the estimator
consumes only (feature → plane id, plane → merged-old-planes), so this stage
runs on the host between the device-side KLT tracking and the device-side
filter step — the Delaunay triangulation (native C++) and the union-find id
merging are inherently sequential. Feature 3D positions come from the batched
device triangulation.

Vectorized (round 3): the original kept per-id Python dicts of normal-history
lists and looped Python over triangles / histories / KNN queries — measured
54 ms/frame, the dominant host cost of the vision path (BASELINE.md round-2).
This version keeps all per-feature state in fixed-capacity numpy arrays
(ring-buffered normal history, slot-aligned plane ids) and computes the
triangle normals, history appends, normal averages, and pairwise gates as
whole-array numpy expressions. Only the order-dependent merge loop (a few
dozen iterations over features with enough normals) and the per-plane z-test
loop (a handful of planes) stay as Python loops, with all their inner work
precomputed. The reference iterates ``std::map`` keyed by feature id, i.e.
ascending-id order — this version iterates ascending id as well.

Algorithm parity notes (cites into TrackPlane.cpp):

* triangle normals: unit cross of edge directions, sign-flipped toward the
  camera (:762-776); triangles with an image-space edge > max_tri_side_px are
  invalid (:753-760);
* per-vertex normal history of ≤ max_norm_count (:783-793), averaged with
  variance/max-angle gates (avg_norm :1123-1171);
* pairwise matching over Delaunay neighbors: image distance ≤ max_pairwise_px,
  normal angle < max_norm_deg, out-of-plane z-distance < max_dist_between_z
  (:847-886); min-id merging with plane2oldplanes history (:894-977);
* spatial filter: mean distance to the filter_num_feat nearest plane-mates,
  z-test against the plane's population (:999-1058) — exact KNN by pairwise
  distances (≡ ikd-tree Nearest_Search on ≤ a few dozen points per plane);
* planes pruned to active features with > 3 supporters (:1060-1095).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Set

import numpy as np

from ov_plane_tpu import native
from ov_plane_tpu.utils.config import TrackPlaneOptions


@dataclass
class PlaneTracker:
    opts: TrackPlaneOptions = field(default_factory=TrackPlaneOptions)
    capacity: int = 512   # id-slot rows (features with live normal history)

    plane_to_oldplanes: Dict[int, Set[int]] = field(default_factory=dict)
    curr_plane_id: int = 0
    # Last frame's gated triangles + normals + pixel positions, kept for the
    # normal-colored Delaunay debug image (eval/trackviz.draw_delaunay_normals;
    # reference TrackPlane::display_history_plane).
    last_viz: Dict = field(default_factory=dict)
    # Sub-stage wall times of the last update (TrackPlane.cpp:1110-1120).
    last_timing: Dict = field(default_factory=dict)

    def __post_init__(self):
        cap, H = self.capacity, max(self.opts.max_norm_count, 1)
        self._ids = np.full(cap, -1, np.int64)        # row → feature id
        self._hist = np.zeros((cap, H, 3))            # ring buffer of normals
        self._hist_cnt = np.zeros(cap, np.int32)      # valid entries (≤ H)
        self._hist_ptr = np.zeros(cap, np.int32)      # next write position
        self._plane = np.full(cap, -1, np.int64)      # row → plane id (-1 none)

    # ------------------------------------------------------------------
    # Dict views kept for diagnostics (scripts/diag_plane_cluster.py) and
    # recording (scripts/run_euroc.py) — not used on the hot path.
    @property
    def feat_norms(self) -> Dict[int, List[np.ndarray]]:
        out: Dict[int, List[np.ndarray]] = {}
        for r in np.nonzero(self._ids >= 0)[0]:
            c = int(self._hist_cnt[r])
            p = int(self._hist_ptr[r])
            H = self._hist.shape[1]
            order = [(p - c + k) % H for k in range(c)]  # oldest → newest
            out[int(self._ids[r])] = [self._hist[r, j].copy() for j in order]
        return out

    @property
    def feat_to_plane(self) -> Dict[int, int]:
        rows = np.nonzero((self._ids >= 0) & (self._plane >= 0))[0]
        return {int(self._ids[r]): int(self._plane[r]) for r in rows}

    def _avg_norm(self, norms: List[np.ndarray]) -> np.ndarray:
        """List-based average (diagnostics); the hot path uses _avg_all."""
        valid = [n for n in norms if np.linalg.norm(n) > 0]
        if not valid:
            return np.zeros(3)
        s = np.sum(valid, axis=0)
        n = np.linalg.norm(s)
        if n <= 0 or len(valid) < 2:
            return np.zeros(3)
        s = s / n
        degs = [np.degrees(np.arccos(np.clip(v @ s, -1, 1))) for v in valid]
        var = np.sum(np.square(degs)) / (len(valid) - 1)
        if np.sqrt(var) > self.opts.max_norm_avg_var or max(degs) > self.opts.max_norm_avg_max:
            return np.zeros(3)
        return s

    # ------------------------------------------------------------------
    def _rows_for(self, ids: np.ndarray) -> np.ndarray:
        """Map feature ids to history rows, allocating free rows for new ids."""
        rows = np.full(len(ids), -1, np.int64)
        # Existing rows.
        live = self._ids >= 0
        order = np.argsort(self._ids[live])
        live_ids = self._ids[live][order]
        live_rows = np.nonzero(live)[0][order]
        pos = np.searchsorted(live_ids, ids)
        pos_ok = (pos < len(live_ids))
        hit = np.zeros(len(ids), bool)
        hit[pos_ok] = live_ids[pos[pos_ok]] == ids[pos_ok]
        rows[hit] = live_rows[pos[hit]]
        # Allocate for the rest.
        need = np.nonzero(~hit)[0]
        free = np.nonzero(~live)[0]
        n = min(len(need), len(free))
        if n:
            r = free[:n]
            rows[need[:n]] = r
            self._ids[r] = ids[need[:n]]
            self._hist_cnt[r] = 0
            self._hist_ptr[r] = 0
            self._plane[r] = -1
        return rows  # -1 = capacity overflow (dropped)

    def _avg_all(self):
        """Vectorized avg_norm over every row (TrackPlane::avg_norm
        :1123-1171): normalized sum gated by stddev/max of the per-entry
        angles to the average."""
        H = self._hist.shape[1]
        cnt = self._hist_cnt
        m = np.arange(H)[None, :] < cnt[:, None]          # ring content mask
        s = np.sum(np.where(m[..., None], self._hist, 0.0), axis=1)
        n = np.linalg.norm(s, axis=1)
        ok = (n > 0) & (cnt >= 2)
        sbar = s / np.maximum(n, 1e-18)[:, None]
        cosang = np.clip(np.einsum("rhk,rk->rh", self._hist, sbar), -1.0, 1.0)
        degs = np.where(m, np.degrees(np.arccos(cosang)), 0.0)
        var = np.sum(degs**2, axis=1) / np.maximum(cnt - 1, 1)
        dmax = np.max(np.where(m, degs, -np.inf), axis=1, initial=-np.inf)
        ok &= (np.sqrt(var) <= self.opts.max_norm_avg_var) & (dmax <= self.opts.max_norm_avg_max)
        return np.where(ok[:, None], sbar, 0.0), ok

    def update(self, ids, uv, p_FinG, valid3d, R_GtoC, p_CinG):
        """One frame of plane detection.

        ids [N] int, uv [N,2] pixels, p_FinG [N,3] triangulated positions,
        valid3d [N] bool, (R_GtoC, p_CinG) the current camera pose.
        Returns (feat2plane: dict, plane2oldplane: dict of sets).
        """
        import time as _time

        ids = np.asarray(ids)
        uv = np.asarray(uv, float)
        p3 = np.asarray(p_FinG, float)
        valid3d = np.asarray(valid3d, bool)
        self.last_viz = {"uv": {}, "tris": [], "norms": []}
        keep = (ids >= 0) & valid3d
        idx = np.nonzero(keep)[0]
        active_ids = ids[ids >= 0]
        if len(idx) < 3:
            self._prune(active_ids)
            self.last_timing = {"delaunay": 0.0, "matching": 0.0}
            return self.feat_to_plane, {k: set(v) for k, v in self.plane_to_oldplanes.items()}

        sub_ids = ids[idx].astype(np.int64)
        sub_uv = uv[idx]
        sub_p = p3[idx]
        Ns = len(sub_ids)
        self.last_viz["uv"] = {int(i): sub_uv[k] for k, i in enumerate(sub_ids)}

        rows = self._rows_for(sub_ids)                 # [Ns] history rows
        row_ok = rows >= 0

        # ----- Delaunay + triangle normals (:715-795), vectorized ---------
        _t0 = _time.perf_counter()
        tris = np.asarray(native.delaunay(sub_uv), np.int64).reshape(-1, 3)
        # Neighbor adjacency over sub indices (built BEFORE the edge gate,
        # matching the reference's neighbor bookkeeping).
        adj = np.zeros((Ns, Ns), bool)
        if len(tris):
            a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
            for x, y in ((a, b), (b, a), (a, c), (c, a), (b, c), (c, b)):
                adj[x, y] = True

            # Edge-length gate (pixels).
            e01 = np.linalg.norm(sub_uv[a] - sub_uv[b], axis=1)
            e12 = np.linalg.norm(sub_uv[b] - sub_uv[c], axis=1)
            e20 = np.linalg.norm(sub_uv[c] - sub_uv[a], axis=1)
            edge_ok = np.maximum(np.maximum(e01, e12), e20) <= self.opts.max_tri_side_px

            d1 = sub_p[b] - sub_p[a]
            d2 = sub_p[c] - sub_p[a]
            n1 = np.linalg.norm(d1, axis=1)
            n2 = np.linalg.norm(d2, axis=1)
            len_ok = (n1 > 0) & (n2 > 0)
            with np.errstate(all="ignore"):
                nrm = np.cross(d1 / np.maximum(n1, 1e-300)[:, None],
                               d2 / np.maximum(n2, 1e-300)[:, None])
            nn = np.linalg.norm(nrm, axis=1)
            tri_ok = edge_ok & len_ok & (nn > 0)
            nrm = nrm / np.maximum(nn, 1e-300)[:, None]
            # Sign: positive distance from the camera (:770-775).
            p_FinC = (sub_p[a] - p_CinG) @ np.asarray(R_GtoC).T
            sgn = np.einsum("ti,ti->t", nrm @ np.asarray(R_GtoC).T, p_FinC)
            nrm = np.where((sgn < 0)[:, None], -nrm, nrm)

            gt = tris[tri_ok]
            gn = nrm[tri_ok]
            self.last_viz["tris"] = [tuple(int(sub_ids[v]) for v in t) for t in gt]
            self.last_viz["norms"] = [g for g in gn]

            # Ring-buffer append of each gated triangle's normal to its three
            # vertices' histories (vectorized grouped write).
            if len(gt):
                v_rows = rows[gt.ravel()]                    # [3T]
                v_norms = np.repeat(gn, 3, axis=0)
                okv = v_rows >= 0
                v_rows, v_norms = v_rows[okv], v_norms[okv]
                order = np.argsort(v_rows, kind="stable")
                v_rows, v_norms = v_rows[order], v_norms[order]
                uniq, start, cnts = np.unique(v_rows, return_index=True, return_counts=True)
                offs = np.arange(len(v_rows)) - np.repeat(start, cnts)
                Hn = self._hist.shape[1]
                wr = (self._hist_ptr[v_rows] + offs) % Hn
                self._hist[v_rows, wr] = v_norms
                self._hist_ptr[uniq] = (self._hist_ptr[uniq] + cnts) % Hn
                self._hist_cnt[uniq] = np.minimum(self._hist_cnt[uniq] + cnts, Hn)

        # ----- pairwise matching + id merging (:814-979) ------------------
        _t1 = _time.perf_counter()
        avg, avg_ok = self._avg_all()                      # [cap,3], [cap]
        sub_avg = np.where(row_ok[:, None], avg[rows], 0.0)
        sub_ok = row_ok & avg_ok[rows] & (self._hist_cnt[rows] >= self.opts.min_norms)
        sub_d = np.einsum("ni,ni->n", sub_p, sub_avg)      # plane offset per feature
        px_d = np.linalg.norm(sub_uv[:, None, :] - sub_uv[None, :, :], axis=2)
        cosang = np.clip(sub_avg @ sub_avg.T, -1.0, 1.0)
        ang = np.degrees(np.arccos(cosang))
        # z-distance of other's point to featid's plane (asymmetric).
        z_d = np.abs(np.einsum("mi,ni->nm", sub_p, sub_avg) - sub_d[:, None])
        pair_ok = (sub_ok[None, :] & (px_d <= self.opts.max_pairwise_px)
                   & (ang < self.opts.max_norm_deg)
                   & (z_d < self.opts.max_dist_between_z) & adj)
        np.fill_diagonal(pair_ok, False)

        plane_of = self._plane                              # row-aligned, mutated
        done = np.zeros(Ns, bool)
        order = np.argsort(sub_ids, kind="stable")          # ascending id ≡ std::map
        for k in order:
            if not sub_ok[k]:
                continue
            if not self.opts.check_old_feats and plane_of[rows[k]] >= 0:
                continue
            m = pair_ok[k] & ~done
            matches = np.nonzero(m)[0]
            if not len(matches):
                continue
            pids = plane_of[rows[matches]]
            pids = pids[pids >= 0]
            own = plane_of[rows[k]]
            cand = list(pids) + ([own] if own >= 0 else [])
            if cand:
                min_pid = int(min(cand))
                # Merge every other plane id of the group into min_pid.
                for old in {int(p) for p in cand if int(p) != min_pid}:
                    plane_of[plane_of == old] = min_pid
                    s = self.plane_to_oldplanes.setdefault(min_pid, set())
                    s.add(old)
                    if old in self.plane_to_oldplanes:
                        s.update(self.plane_to_oldplanes.pop(old))
                plane_of[rows[matches]] = min_pid
                plane_of[rows[k]] = min_pid
                done[k] = True
            else:
                self.curr_plane_id += 1
                plane_of[rows[matches]] = self.curr_plane_id
                plane_of[rows[k]] = self.curr_plane_id

        # ----- spatial z-test filter (:999-1058) --------------------------
        # Exact KNN by pairwise distances (the reference queries an ikd-tree
        # over the same ≤ few-dozen points; exact distances, k+1 nearest).
        k_nn = self.opts.filter_num_feat
        sub_pid = plane_of[rows]
        for p in np.unique(sub_pid[sub_pid >= 0]):
            members = np.nonzero((sub_pid == p) & row_ok)[0]
            if len(members) <= k_nn:
                continue
            pts = sub_p[members]
            dmat = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=2)
            part = np.partition(dmat, kth=min(k_nn, len(members) - 1), axis=1)
            avg_d = part[:, 1:k_nn + 1].mean(axis=1)       # drop self (col 0)
            mu = avg_d.mean()
            sd = np.sqrt(np.sum((avg_d - mu) ** 2) / (len(members) - 1))
            if sd <= 0:
                continue
            out = np.abs(avg_d - mu) / sd > self.opts.filter_z_thresh
            plane_of[rows[members[out]]] = -1

        # ----- prune to active, well-supported planes (:1060-1095) --------
        # "Active" here = features with a valid triangulation THIS frame
        # (sub_ids), matching the reference's per-frame membership rebuild.
        self._prune(sub_ids)
        self.last_timing = {"delaunay": _t1 - _t0, "matching": _time.perf_counter() - _t1}
        return self.feat_to_plane, {k2: set(v) for k2, v in self.plane_to_oldplanes.items()}

    def _prune(self, active_ids):
        active_ids = np.asarray(active_ids, np.int64)
        live = self._ids >= 0
        is_active = live & np.isin(self._ids, active_ids)
        # Plane membership only for active features; planes need > 3 supporters.
        self._plane[~is_active] = -1
        pids, cnts = np.unique(self._plane[self._plane >= 0], return_counts=True)
        weak = pids[cnts <= 3]
        if len(weak):
            self._plane[np.isin(self._plane, weak)] = -1
        keep_planes = set(int(p) for p in np.unique(self._plane[self._plane >= 0]))
        self.plane_to_oldplanes = {
            p: s for p, s in self.plane_to_oldplanes.items() if p in keep_planes
        }
        # Drop history rows of features gone from view entirely.
        drop = live & ~is_active & (self._plane < 0)
        self._ids[drop] = -1
        self._hist_cnt[drop] = 0
        self._hist_ptr[drop] = 0
