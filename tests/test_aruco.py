"""ArUco fiducial tracking (ov_core TrackAruco equivalent, frontend/aruco.py)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
if not hasattr(cv2, "aruco"):
    pytest.skip("cv2.aruco missing", allow_module_level=True)

from ov_plane_tpu.frontend.aruco import ArucoOptions, ArucoTracker


def make_frame(marker_ids, positions, size=80, hw=(480, 640)):
    dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_6X6_250)
    img = np.full(hw, 255, np.uint8)
    for mid, (x, y) in zip(marker_ids, positions):
        m = cv2.aruco.generateImageMarker(dic, mid, size)
        img[y:y + size, x:x + size] = m
    return img


def test_detect_stable_ids_across_frames():
    trk = ArucoTracker(ArucoOptions(downsize=False))
    img0 = make_frame([7, 23], [(100, 100), (400, 250)])
    ids0, uv0 = trk.detect(img0)
    assert len(ids0) == 8  # 4 corners x 2 markers
    # Shifted second frame: same ids, shifted corners.
    img1 = make_frame([7, 23], [(110, 108), (410, 258)])
    ids1, uv1 = trk.detect(img1)
    assert set(ids0) == set(ids1)
    # Corner displacement matches the shift (order-align by id).
    o0 = np.argsort(ids0); o1 = np.argsort(ids1)
    d = uv1[o1] - uv0[o0]
    np.testing.assert_allclose(d[:, 0].mean(), 10.0, atol=1.0)
    np.testing.assert_allclose(d[:, 1].mean(), 8.0, atol=1.0)
    # Ids live in the reserved range, below the first natural-feature id.
    assert ids0.max() < trk.first_free_id
    # Float input path.
    ids2, _ = trk.detect(img0.astype(np.float64) / 255.0)
    assert set(ids2) == set(ids0)


def test_empty_and_downsized():
    trk = ArucoTracker(ArucoOptions(downsize=True))
    ids, uv = trk.detect(np.full((480, 640), 255, np.uint8))
    assert len(ids) == 0
    img = make_frame([3], [(200, 150)], size=120)
    ids, uv = trk.detect(img)
    assert len(ids) == 4
    # Downsized detection still reports full-resolution pixel coordinates.
    assert 190 < uv[:, 0].min() < 210 and 140 < uv[:, 1].min() < 160


def test_pipeline_reserves_id_range():
    from ov_plane_tpu.models.manager import VioEngine
    from ov_plane_tpu.frontend.pipeline import VisionPipeline
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.use_aruco = True
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    eng = VioEngine.from_config(cfg)
    pipe = VisionPipeline(cfg, eng)
    assert pipe.fe.next_id == pipe.aruco.first_free_id
