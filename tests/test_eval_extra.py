"""Tests: RPE metric sanity, OBJ wireframe render, posyaw ATE alignment."""

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.eval.metrics import ate_posyaw, rpe
from ov_plane_tpu.eval.render import load_obj, plane_frame, rasterize_segments, wireframe_segments
from ov_plane_tpu.ops.quat import rot_2_quat, rot_z

RNG = np.random.default_rng(23)


def _circle_traj(n=200, r=5.0):
    th = np.linspace(0, 2 * np.pi, n)
    p = np.stack([r * np.cos(th), r * np.sin(th), 0.2 * np.sin(3 * th)], axis=1)
    q = np.stack([np.asarray(rot_2_quat(rot_z(jnp.asarray(t)))) for t in th])
    return p, q


def test_rpe_zero_for_identical():
    p, q = _circle_traj()
    out = rpe(jnp.asarray(p), jnp.asarray(q), jnp.asarray(p), jnp.asarray(q), segment_lengths=(8.0,))
    ori, pos = out[8.0]
    assert float(ori) < 1e-6
    assert float(pos) < 1e-9


def test_rpe_detects_drift():
    p, q = _circle_traj()
    drift = np.linspace(0, 0.5, len(p))[:, None] * np.array([1.0, 0, 0])
    out = rpe(jnp.asarray(p + drift), jnp.asarray(q), jnp.asarray(p), jnp.asarray(q), segment_lengths=(8.0,))
    _, pos = out[8.0]
    assert 0.01 < float(pos) < 0.3


def test_ate_posyaw_invariant_to_yaw_offset():
    p, q = _circle_traj()
    yaw = 0.7
    Rz = np.asarray(rot_z(jnp.asarray(yaw)))
    # Estimate = gt rotated by yaw + translated: posyaw alignment removes it.
    p_est = p @ Rz + np.array([1.0, -2.0, 0.3])
    q_est = np.stack([np.asarray(rot_2_quat(jnp.asarray(np.asarray(rot_z(jnp.asarray(th + yaw))))))
                      for th in np.linspace(0, 2 * np.pi, len(p))])
    ate_pos, ate_ori, _, _ = ate_posyaw(jnp.asarray(p_est), jnp.asarray(q_est), jnp.asarray(p), jnp.asarray(q))
    assert float(ate_pos) < 0.02, float(ate_pos)
    assert float(ate_ori) < 1.5, float(ate_ori)


def test_obj_wireframe(tmp_path):
    # Tiny tetrahedron OBJ.
    obj = tmp_path / "tet.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n"
    )
    verts, faces = load_obj(str(obj))
    assert verts.shape == (4, 3) and faces.shape == (4, 3)

    cp = np.array([0.0, 0.0, 2.0])
    R, o = plane_frame(cp)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    R_GtoC = np.eye(3)
    p_CinG = np.zeros(3)
    zeta = np.array([300.0, 300.0, 320.0, 240.0, 0, 0, 0, 0])
    segs = wireframe_segments(verts, faces, cp, 0.3, R_GtoC, p_CinG, zeta, (640, 480))
    assert len(segs) > 4
    img = rasterize_segments(segs, (640, 480))
    assert img.sum() > 10


def test_ar_anchor_in_view_on_plane_and_axis():
    """ar_anchor: intersection of the optical axis with the CP plane — on the
    plane, along the axis, None when the plane is behind the camera."""
    import numpy as np

    from ov_plane_tpu.eval.render import ar_anchor_in_view, plane_frame, wireframe_segments

    cp = np.array([0.0, 0.0, 2.0])          # plane z=2, normal +z
    R_GtoC = np.eye(3)                      # camera looks along +z (global)
    p_CinG = np.array([0.4, -0.3, 0.0])
    a = ar_anchor_in_view(cp, R_GtoC, p_CinG)
    n = cp / np.linalg.norm(cp)
    assert abs(a @ n - np.linalg.norm(cp)) < 1e-12          # on the plane
    np.testing.assert_allclose(a[:2], p_CinG[:2], atol=1e-12)  # along +z axis
    # Plane behind: flip the camera.
    R_back = np.diag([1.0, -1.0, -1.0])
    assert ar_anchor_in_view(cp, R_back, p_CinG) is None
    # Anchored wireframe lands in frame.
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    zeta = np.array([300.0, 300, 320, 240, 0, 0, 0, 0])
    segs = wireframe_segments(verts, faces, cp, 0.3, R_GtoC, p_CinG,
                              zeta, (640, 480), anchor=a)
    assert len(segs) > 0


def test_loop_pack_contents_and_depth_image():
    """Loop-closure info pack: geometry consistent (uvd depth == camera-frame
    z of feat_p_G), sparse depth image carries those depths in mm."""
    import numpy as np

    from ov_plane_tpu.eval.loopclosure import loop_pack

    rng = np.random.default_rng(2)
    N = 12
    R_GtoC = np.eye(3)
    p_CinG = np.array([0.2, -0.1, 0.0])
    p3 = np.stack([rng.uniform(-1, 1, N), rng.uniform(-1, 1, N),
                   rng.uniform(1.0, 4.0, N)], axis=1)
    depth = (p3 - p_CinG) @ R_GtoC[2]
    zeta = np.array([300.0, 300, 320, 240, 0, 0, 0, 0])
    uv = 300 * (p3[:, :2] - p_CinG[:2]) / depth[:, None] + [320, 240]
    ids = np.arange(N)
    ok = np.ones(N, bool)
    ok[3] = False  # one invalid slot must be dropped

    pack = loop_pack(1.5, [0, 0, 0, 1.0], p_CinG, R_GtoC, p_CinG,
                     np.array([0, 0, 0, 1.0, 0, 0, 0]), zeta,
                     ids, uv, p3, ok, (640, 480))
    assert pack["feat_id"].tolist() == [i for i in range(N) if i != 3]
    np.testing.assert_allclose(pack["feat_uvd"][:, 2],
                               np.delete(depth, 3), atol=1e-12)
    img = pack["depth_img"]
    assert img.dtype == np.uint16 and img.shape == (480, 640)
    k = 0 if 3 != 0 else 1
    u, v = int(round(uv[k, 0])), int(round(uv[k, 1]))
    assert abs(int(img[v, u]) - depth[k] * 1000) <= 1
