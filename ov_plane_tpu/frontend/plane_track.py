"""Plane detection: Delaunay normals → per-vertex averaging → pairwise
clustering with plane-id merging → spatial z-test filtering.

Host-side re-implementation of the plane half of ``TrackPlane``
(perform_plane_detection_monocular, TrackPlane.cpp:580-1121): the estimator
consumes only (feature → plane id, plane → merged-old-planes), so this stage
runs on the host between the device-side KLT tracking and the device-side
filter step — the Delaunay triangulation (native C++) and the union-find id
merging are inherently sequential. Feature 3D positions come from the batched
device triangulation.

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
  z-test against the plane's population (:999-1058) — uses the native voxel
  point map (ikd-tree equivalent);
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

    feat_norms: Dict[int, List[np.ndarray]] = field(default_factory=dict)
    feat_to_plane: Dict[int, int] = field(default_factory=dict)
    plane_to_oldplanes: Dict[int, Set[int]] = field(default_factory=dict)
    curr_plane_id: int = 0
    # Last frame's gated triangles + normals + pixel positions, kept for the
    # normal-colored Delaunay debug image (eval/trackviz.draw_delaunay_normals;
    # reference TrackPlane::display_history_plane).
    last_viz: Dict = field(default_factory=dict)
    # Sub-stage wall times of the last update (TrackPlane.cpp:1110-1120).
    last_timing: Dict = field(default_factory=dict)

    # ------------------------------------------------------------------
    def _avg_norm(self, norms: List[np.ndarray]) -> np.ndarray:
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

    def update(self, ids, uv, p_FinG, valid3d, R_GtoC, p_CinG):
        """One frame of plane detection.

        ids [N] int, uv [N,2] pixels, p_FinG [N,3] triangulated positions,
        valid3d [N] bool, (R_GtoC, p_CinG) the current camera pose.
        Returns (feat2plane: dict, plane2oldplane: dict of sets).
        """
        ids = np.asarray(ids)
        uv = np.asarray(uv, float)
        p3 = np.asarray(p_FinG, float)
        valid3d = np.asarray(valid3d, bool)
        self.last_viz = {"uv": {}, "tris": [], "norms": []}
        keep = (ids >= 0) & valid3d
        idx = np.nonzero(keep)[0]
        if len(idx) < 3:
            self._prune(set(ids[ids >= 0].tolist()))
            self.last_timing = {"delaunay": 0.0, "matching": 0.0}
            return dict(self.feat_to_plane), {k: set(v) for k, v in self.plane_to_oldplanes.items()}

        sub_ids = ids[idx]
        sub_uv = uv[idx]
        sub_p = p3[idx]
        pos = {int(i): sub_p[k] for k, i in enumerate(sub_ids)}
        pts2 = {int(i): sub_uv[k] for k, i in enumerate(sub_ids)}
        self.last_viz["uv"] = pts2

        # ----- Delaunay + triangle normals (:715-795) ---------------------
        import time as _time

        _t0 = _time.perf_counter()
        tris = native.delaunay(sub_uv)
        neighbors: Dict[int, Set[int]] = {}
        for t in tris:
            i1, i2, i3 = (int(sub_ids[t[0]]), int(sub_ids[t[1]]), int(sub_ids[t[2]]))
            for a, b, c in ((i1, i2, i3), (i2, i1, i3), (i3, i1, i2)):
                neighbors.setdefault(a, set()).update((b, c))
            # Edge-length gate (pixels).
            e01 = np.linalg.norm(sub_uv[t[0]] - sub_uv[t[1]])
            e12 = np.linalg.norm(sub_uv[t[1]] - sub_uv[t[2]])
            e20 = np.linalg.norm(sub_uv[t[2]] - sub_uv[t[0]])
            if max(e01, e12, e20) > self.opts.max_tri_side_px:
                continue
            d1 = pos[i2] - pos[i1]
            d2 = pos[i3] - pos[i1]
            n1, n2 = np.linalg.norm(d1), np.linalg.norm(d2)
            if n1 <= 0 or n2 <= 0:
                continue
            nrm = np.cross(d1 / n1, d2 / n2)
            nn = np.linalg.norm(nrm)
            if nn <= 0:
                continue
            nrm = nrm / nn
            # Sign: positive distance from the camera (:770-775).
            p_FinC = R_GtoC @ (pos[i1] - p_CinG)
            if (R_GtoC @ nrm) @ p_FinC < 0:
                nrm = -nrm
            self.last_viz["tris"].append((i1, i2, i3))
            self.last_viz["norms"].append(nrm)
            for i in (i1, i2, i3):
                hist = self.feat_norms.setdefault(i, [])
                hist.append(nrm)
                if len(hist) > self.opts.max_norm_count:
                    del hist[: len(hist) - self.opts.max_norm_count]

        # ----- pairwise matching + id merging (:814-979) ------------------
        _t1 = _time.perf_counter()
        avg = {i: self._avg_norm(v) for i, v in self.feat_norms.items()}
        done: Set[int] = set()
        for featid, norms in self.feat_norms.items():
            if len(norms) < self.opts.min_norms:
                continue
            norm = avg[featid]
            if np.linalg.norm(norm) <= 0:
                continue
            if not self.opts.check_old_feats and featid in self.feat_to_plane:
                continue
            if featid not in neighbors or featid not in pos:
                continue
            d = pos[featid] @ norm

            matches = []
            for other in neighbors[featid]:
                if other not in self.feat_norms or len(self.feat_norms[other]) < self.opts.min_norms:
                    continue
                norm2 = avg.get(other, np.zeros(3))
                if np.linalg.norm(norm2) <= 0 or other in done:
                    continue
                if np.linalg.norm(pts2[featid] - pts2[other]) > self.opts.max_pairwise_px:
                    continue
                plane_dist = pos[other] @ norm - d
                angle = np.degrees(np.arccos(np.clip(norm @ norm2, -1, 1)))
                if angle < self.opts.max_norm_deg and abs(plane_dist) < self.opts.max_dist_between_z:
                    matches.append(other)
            if not matches:
                continue

            min_planeid = self.feat_to_plane.get(featid, -1)
            for m in matches:
                pid = self.feat_to_plane.get(m, -1)
                if pid >= 0:
                    min_planeid = pid if min_planeid < 0 else min(min_planeid, pid)

            if min_planeid >= 0:
                def merge_into(new_id: int, old_id: int):
                    if new_id == old_id:
                        return
                    for f, p in list(self.feat_to_plane.items()):
                        if p == old_id:
                            self.feat_to_plane[f] = new_id
                    s = self.plane_to_oldplanes.setdefault(new_id, set())
                    s.add(old_id)
                    if old_id in self.plane_to_oldplanes:
                        s.update(self.plane_to_oldplanes.pop(old_id))

                for m in matches:
                    if m in self.feat_to_plane:
                        merge_into(min_planeid, self.feat_to_plane[m])
                if featid in self.feat_to_plane:
                    merge_into(min_planeid, self.feat_to_plane[featid])
                for m in matches:
                    self.feat_to_plane[m] = min_planeid
                self.feat_to_plane[featid] = min_planeid
                done.add(featid)
            else:
                self.curr_plane_id += 1
                for m in matches:
                    self.feat_to_plane[m] = self.curr_plane_id
                self.feat_to_plane[featid] = self.curr_plane_id

        # ----- spatial z-test filter (:999-1058) --------------------------
        plane_to_feat: Dict[int, List[int]] = {}
        active_ids = set(int(i) for i in sub_ids)
        for f, p in self.feat_to_plane.items():
            if f in active_ids:
                plane_to_feat.setdefault(p, []).append(f)
        k = self.opts.filter_num_feat
        vmap_store = native.VoxelPointMap(voxel=0.5)
        for p, feats in plane_to_feat.items():
            if len(feats) <= k:
                continue
            pts = np.stack([pos[f] for f in feats])
            vmap_store.clear()
            vmap_store.add(pts, np.asarray(feats, np.int32))
            avg_d = np.zeros(len(feats))
            for i, f in enumerate(feats):
                dists, _, _ = vmap_store.knn(pts[i], k + 1)
                avg_d[i] = float(np.mean(dists[1:]))  # drop self
            mu = avg_d.mean()
            sd = np.sqrt(np.sum((avg_d - mu) ** 2) / (len(feats) - 1))
            if sd <= 0:
                continue
            for i, f in enumerate(feats):
                if abs(avg_d[i] - mu) / sd > self.opts.filter_z_thresh:
                    self.feat_to_plane.pop(f, None)

        # ----- prune to active, well-supported planes (:1060-1095) --------
        self._prune(active_ids)
        self.last_timing = {"delaunay": _t1 - _t0, "matching": _time.perf_counter() - _t1}
        return dict(self.feat_to_plane), {k2: set(v) for k2, v in self.plane_to_oldplanes.items()}

    def _prune(self, active_ids: Set[int]):
        active = {f: p for f, p in self.feat_to_plane.items() if f in active_ids}
        counts: Dict[int, int] = {}
        for p in active.values():
            counts[p] = counts.get(p, 0) + 1
        self.feat_to_plane = {f: p for f, p in active.items() if counts[p] > 3}
        keep_planes = set(self.feat_to_plane.values())
        self.plane_to_oldplanes = {
            p: s for p, s in self.plane_to_oldplanes.items() if p in keep_planes
        }
        # Also drop norm history of features gone from view entirely.
        self.feat_norms = {f: v for f, v in self.feat_norms.items() if f in active_ids or f in self.feat_to_plane}
