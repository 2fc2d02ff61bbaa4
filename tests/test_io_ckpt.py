"""Round-trip tests for the recording/IO surface and checkpointing."""

import numpy as np
import jax.numpy as jnp

from ov_plane_tpu.eval import io as eio
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.state.layout import StateLayout
from ov_plane_tpu.state.vio_state import VioState
from ov_plane_tpu.utils import checkpoint as ckpt

RNG = np.random.default_rng(4)


def test_tum_roundtrip(tmp_path):
    n = 10
    t = np.arange(n) * 0.1
    pos = RNG.normal(size=(n, 3))
    q = RNG.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 3] < 0] *= -1
    path = str(tmp_path / "traj.txt")
    eio.write_tum(path, t, pos, q)
    t2, p2, q2 = eio.read_tum(path)
    np.testing.assert_allclose(t2, t, atol=1e-9)
    np.testing.assert_allclose(p2, pos, atol=1e-6)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_euroc_gt_parse(tmp_path):
    path = str(tmp_path / "gt.csv")
    with open(path, "w") as f:
        f.write("#ts,px,py,pz,qw,qx,qy,qz,vx,vy,vz,bwx,bwy,bwz,bax,bay,baz\n")
        f.write("1403636580838555648,4.6,-1.8,0.8,0.53,-0.15,-0.82,-0.08,0.1,0.2,0.3,0.01,0.02,0.03,0.1,0.2,0.3\n")
    t, pos, q, v, bg, ba = eio.read_euroc_gt(path)
    assert abs(t[0] - 1403636580.838555648) < 1e-6
    np.testing.assert_allclose(pos[0], [4.6, -1.8, 0.8])
    # JPL q_GtoI == Hamilton q_ItoG component-wise: plain wxyz→xyzw reorder,
    # no conjugation, no renormalization (reference DatasetReader parses raw).
    np.testing.assert_allclose(q[0], [-0.15, -0.82, -0.08, 0.53], atol=1e-12)
    np.testing.assert_allclose(bg[0], [0.01, 0.02, 0.03])


def test_quaternion_convention_semantics():
    """write_tum/read_euroc_gt must agree with quat_2_rot: a JPL q_GtoI has
    the same components as the Hamilton q_ItoG that scipy produces for the
    inverse rotation (reference DatasetReader does a plain reorder)."""
    from scipy.spatial.transform import Rotation
    from ov_plane_tpu.ops.quat import quat_2_rot

    rng = np.random.default_rng(7)
    rv = rng.normal(size=3)
    R_ItoG = Rotation.from_rotvec(rv).as_matrix()
    q_h_xyzw = Rotation.from_matrix(R_ItoG).as_quat()  # Hamilton I->G
    R_jpl = np.asarray(quat_2_rot(jnp.asarray(q_h_xyzw)))  # JPL: same comps = G->I
    np.testing.assert_allclose(R_jpl, R_ItoG.T, atol=1e-12)


def test_timing_recorder(tmp_path):
    rec = eio.TimingRecorder()
    for i in range(5):
        rec.add(i * 0.1, {"tracking": 0.001 * i, "total": 0.01})
    path = str(tmp_path / "timing.csv")
    rec.write(path)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("# timestamp,tracking")
    assert len(lines) == 6
    s = rec.summary()
    assert abs(s["total"]["mean"] - 0.01) < 1e-12


def test_checkpoint_npz_roundtrip(tmp_path):
    lay = StateLayout(max_clones=3, max_slam=2, max_planes=1)
    st = VioState.create(lay)
    st = st.replace(imu=st.imu.at[4].set(1.5), cov=jnp.eye(lay.dim) * 0.3)
    bank = FeatureBank.create(16, lay.max_clones)
    bank = bank.replace(fid=bank.fid.at[0].set(42))
    path = str(tmp_path / "ckpt.npz")
    ckpt.save_npz(path, st, bank)
    st2, bank2 = ckpt.load_npz(path, VioState.create(lay), FeatureBank.create(16, lay.max_clones))
    np.testing.assert_allclose(np.asarray(st2.imu), np.asarray(st.imu))
    np.testing.assert_allclose(np.asarray(st2.cov), np.asarray(st.cov))
    assert int(bank2.fid[0]) == 42


def test_checkpoint_orbax_roundtrip(tmp_path):
    try:
        import orbax.checkpoint  # noqa: F401
    except Exception:
        import pytest

        pytest.skip("orbax not installed")
    lay = StateLayout(max_clones=3, max_slam=2, max_planes=1)
    st = VioState.create(lay).replace(t=jnp.asarray(3.5))
    bank = FeatureBank.create(8, lay.max_clones)
    d = str(tmp_path / "orbax_ckpt")
    ckpt.save_orbax(d, st, bank)
    st2, _ = ckpt.load_orbax(d, VioState.create(lay), FeatureBank.create(8, lay.max_clones))
    assert float(st2.t) == 3.5
