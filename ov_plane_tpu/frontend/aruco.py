"""ArUco fiducial tracking (ov_core TrackAruco equivalent).

The reference's TrackAruco wraps OpenCV's ArUco detector and emits each
marker's four corners as features with RESERVED, GLOBALLY STABLE ids in the
low range [base, base + 4*max_markers) — re-detected every frame (no KLT),
so a marker seen again after occlusion resumes the same feature ids and its
corners become long-lived (SLAM-grade) tracks. Natural features start above
the reserved range.

Host-side component (detection is decode logic, not dense math); the
corners join the same fixed-shape observation arrays as every other feature,
so the device-side filter is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:
    import cv2

    _HAS_CV2 = hasattr(cv2, "aruco")
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None
    _HAS_CV2 = False


@dataclass
class ArucoOptions:
    dictionary: str = "DICT_6X6_250"
    max_markers: int = 1024      # size of the reserved id range
    id_base: int = 1             # first reserved feature id
    downsize: bool = False       # detect at half resolution (downsize_aruco)


class ArucoTracker:
    """Detect ArUco markers and map them to stable feature ids."""

    def __init__(self, opts: ArucoOptions = ArucoOptions()):
        if not _HAS_CV2:
            raise ImportError("cv2.aruco not available; ArUco tracking disabled")
        self.opts = opts
        dic = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, opts.dictionary))
        self._detector = cv2.aruco.ArucoDetector(dic, cv2.aruco.DetectorParameters())

    @property
    def first_free_id(self) -> int:
        """First feature id NOT reserved for ArUco corners."""
        return self.opts.id_base + 4 * self.opts.max_markers

    def feature_ids(self, marker_id: int) -> np.ndarray:
        return self.opts.id_base + 4 * marker_id + np.arange(4)

    def detect(self, img: np.ndarray):
        """img: [H, W] float in [0,1] or uint8. Returns (ids [N], uv [N, 2])
        with one row per CORNER (4 per detected marker), ids stable."""
        if img.dtype != np.uint8:
            img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        else:
            img8 = img
        scale = 1.0
        if self.opts.downsize:
            img8 = cv2.resize(img8, (img8.shape[1] // 2, img8.shape[0] // 2))
            scale = 2.0
        corners, mids, _ = self._detector.detectMarkers(img8)
        if mids is None or len(mids) == 0:
            return np.zeros(0, np.int64), np.zeros((0, 2))
        out_ids, out_uv = [], []
        for c, mid in zip(corners, mids.ravel()):
            if mid >= self.opts.max_markers:
                continue
            out_ids.append(self.feature_ids(int(mid)))
            out_uv.append(c.reshape(4, 2) * scale)
        if not out_ids:
            return np.zeros(0, np.int64), np.zeros((0, 2))
        return np.concatenate(out_ids), np.vstack(out_uv)
