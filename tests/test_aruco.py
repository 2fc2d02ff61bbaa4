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


# ---------------------------------------------------------------------------
# Estimator-level SLAM privileges (VERDICT r3 #9): aruco landmarks are never
# marginalized and live outside the max_slam budget
# (StateHelper.cpp:638-652, VioManager.cpp:438-452,484).
# ---------------------------------------------------------------------------

def _aruco_engine(max_slam=2):
    from ov_plane_tpu.models.manager import VioEngine
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.use_aruco = True
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.max_slam_features = max_slam
    cfg.tpu.max_aruco_landmarks = 4
    cfg.tpu.max_features = 32
    eng = VioEngine.from_config(cfg)
    assert eng.aruco_max_id == 1 + 4 * 1024
    # ArUco slots are ON TOP of the natural budget.
    assert eng.layout.max_slam == max_slam + 4
    return cfg, eng


def test_aruco_landmark_never_marginalized():
    import jax.numpy as jnp

    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.slam import marginalize_lost_slam
    from ov_plane_tpu.state.vio_state import VioState

    cfg, eng = _aruco_engine()
    lay = eng.layout
    state = VioState.create(lay)
    natural_id, aruco_id = 90000, 9     # 9 is inside the reserved range
    state = state.replace(
        slam_id=state.slam_id.at[0].set(natural_id).at[1].set(aruco_id),
        slam_active=state.slam_active.at[0].set(True).at[1].set(True),
        cov=jnp.eye(lay.dim) * 1e-3,
    )
    bank = FeatureBank.create(32, lay.max_clones)  # NEITHER id tracked anymore

    new_state, n_marg = marginalize_lost_slam(state, bank, eng.aruco_max_id)
    assert int(n_marg) == 1
    active = np.asarray(new_state.slam_active)
    assert not active[0], "lost natural landmark must marginalize"
    assert active[1], "aruco landmark must survive track loss (never marg)"
    assert int(new_state.slam_id[1]) == aruco_id
    # Without the aruco range, both would marginalize (the old behavior).
    both, n2 = marginalize_lost_slam(state, bank, 0)
    assert int(n2) == 2


def test_aruco_triage_priority_and_budget_exemption():
    """An aruco corner at the marg boundary is promoted ahead of natural
    max-tracks, and aruco landmarks already in the state free up budget."""
    import jax.numpy as jnp

    from ov_plane_tpu.models.feature_bank import FeatureBank
    from ov_plane_tpu.models.manager import triage
    from ov_plane_tpu.state.vio_state import VioState

    cfg, eng = _aruco_engine(max_slam=1)
    lay = eng.layout
    K = lay.max_clones

    # Window full: max_clone_size+1 live clones.
    state = VioState.create(lay)
    clones_t = np.arange(1.0, K + 1.0)
    state = state.replace(clones_t=jnp.asarray(clones_t))
    marg_slot = int(np.asarray(state.oldest_clone_slot))
    cur_slot = int(np.asarray(state.newest_clone_slot))

    # Natural budget (1) already consumed by a NATURAL landmark; one aruco
    # landmark also in state — it must NOT count against the budget.
    state = state.replace(
        slam_id=state.slam_id.at[0].set(70000).at[1].set(13),
        slam_active=state.slam_active.at[0].set(True).at[1].set(True),
    )

    bank = FeatureBank.create(32, K)
    # Row 0: aruco corner (id 21), short track but observed at the marg slot.
    # Row 1: natural max-track (id 50000) with a FULL window.
    mask = np.zeros((32, K), bool)
    mask[0, marg_slot] = True
    mask[0, cur_slot] = True
    mask[1, :] = True
    bank = bank.replace(
        fid=bank.fid.at[0].set(21).at[1].set(50000),
        mask=jnp.asarray(mask),
    )

    sel_idx, sel_valid, slam_idx, slam_valid = triage(
        eng, state, bank, cur_slot, jnp.asarray(True))
    promoted = [int(slam_idx[i]) for i in range(len(np.asarray(slam_valid)))
                if bool(np.asarray(slam_valid)[i])]
    # Budget: natural slots full (1/1), but the in-state aruco landmark adds
    # one — exactly one promotion admitted, and it is the aruco corner
    # (priority over the longer natural max-track).
    assert promoted == [0], (promoted, np.asarray(slam_valid))
