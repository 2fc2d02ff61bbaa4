"""Wire-dtype / sampler safety guard (frontend/wire_guard.py, VERDICT r3 #5):
the quantized fast modes (u8 wire, bf16 patch sampler) are taken iff the
source image is already on the 8-bit lattice — provably lossless for the
wire, and at/below the source's own quantization floor for the sampler.

Background measurement (BASELINE.md round 4): the dim sparse-blob scene that
diverges under u8 ALSO diverges when its SOURCE is quantized to 8 bits and
run through the exact f32 path (final error 1.99 vs 2.00) — the failure is a
property of 8-bit imaging, not of the wire. Hence the exact-losslessness rule
rather than a tunable texture heuristic.
"""

import numpy as np
import pytest

from ov_plane_tpu.frontend import wire_guard as wg


def test_u8_representable():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    assert wg.u8_representable(u8)
    assert wg.u8_representable(u8.astype(np.float32) / 255.0)
    # Generic float imagery is off the lattice.
    f = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    assert not wg.u8_representable(f)
    # Quantizing at the source puts it back on.
    assert wg.u8_representable(np.rint(f * 255) / 255.0)
    # Out-of-range floats are not u8 material.
    assert not wg.u8_representable(f + 2.0)


def test_resolution_rules():
    rng = np.random.default_rng(1)
    f = rng.uniform(0, 1, (2, 48, 64)).astype(np.float32)  # float batch
    q = np.rint(f * 255) / 255.0                           # 8-bit batch

    wire, sampler, info = wg.resolve_wire_and_sampler(f, "auto", "auto")
    assert (wire, sampler) == ("f32", "mm")
    assert info["u8_lossless"] is False
    wire, sampler, info = wg.resolve_wire_and_sampler(q, "auto", "auto")
    assert (wire, sampler) == ("u8", "mm_bf16")
    assert info["u8_lossless"] is True
    # Mixed batch: ONE off-lattice stream forces the safe modes (one program
    # serves the whole batch).
    mixed = np.concatenate([q[:1], f[1:]])
    wire, sampler, _ = wg.resolve_wire_and_sampler(mixed, "auto", "auto")
    assert (wire, sampler) == ("f32", "mm")
    # Explicit requests pass through, even unsafe ones (A/B measurements).
    wire, sampler, info = wg.resolve_wire_and_sampler(f, "u8", "mm_bf16")
    assert (wire, sampler) == ("u8", "mm_bf16")
    assert info["reason"] is None


def _driver(monkeypatch):
    """Small fused driver with 'auto' defaults (env cleared)."""
    monkeypatch.delenv("OVP_IMG_WIRE", raising=False)
    monkeypatch.delenv("OVP_KLT_SAMPLER", raising=False)
    from ov_plane_tpu.frontend.fused import FusedVisionDriver
    from ov_plane_tpu.models.manager import VioEngine
    from ov_plane_tpu.utils.config import sim_config

    cfg = sim_config()
    cfg.state.use_plane_constraint = False
    cfg.state.use_plane_slam_feats = False
    cfg.state.max_slam_features = 0
    cfg.cam_wh = [64, 48]
    cfg.tpu.max_features = 32
    cfg.tpu.max_obs_per_frame = 16
    cfg.tpu.max_msckf_update = 8
    eng = VioEngine.from_config(cfg)
    return FusedVisionDriver(cfg, eng)


def test_driver_resolves_float_source_to_exact_path(monkeypatch):
    drv = _driver(monkeypatch)
    assert drv.vopts.img_wire == "auto" and drv.vopts.klt.sampler == "auto"
    img = np.random.default_rng(2).uniform(0, 1, (48, 64)).astype(np.float32)
    drv._resolve_guard(img)
    assert drv.vopts.img_wire == "f32"
    assert drv.vopts.klt.sampler == "mm"
    assert drv.wire_guard_info["u8_lossless"] is False


def test_driver_resolves_u8_source_to_fast_path_and_downgrades(monkeypatch):
    drv = _driver(monkeypatch)
    rng = np.random.default_rng(3)
    q = np.rint(rng.uniform(0, 1, (48, 64)).astype(np.float32) * 255) / 255.0
    drv._resolve_guard(q)
    assert drv.vopts.img_wire == "u8"
    assert drv.vopts.klt.sampler == "mm_bf16"
    # Mid-stream regime flip: off-lattice frames trip the sampled recheck and
    # downgrade the wire (never silently ship lossy quantization).
    f = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    for _ in range(20):
        drv._resolve_guard(f)
    assert drv.vopts.img_wire == "f32"
    assert drv.wire_guard_info.get("downgraded") is True


@pytest.mark.slow
def test_guard_trips_on_dim_scene_and_tracking_survives(monkeypatch):
    """The known-diverging dim scene (test_fused's blob fixture): under the
    'auto' defaults the guard must keep the exact f32/'mm' path and the filter
    must stay bounded — the same quality gate as the explicit-f32 e2e."""
    monkeypatch.delenv("OVP_IMG_WIRE", raising=False)
    monkeypatch.delenv("OVP_KLT_SAMPLER", raising=False)
    import jax.numpy as jnp

    from ov_plane_tpu.frontend.fused import FusedVisionDriver
    from test_fused import _imu_window, _setup

    cfg, eng, state, bank, sim, frames, n = _setup()
    n = min(n, 12)
    drv = FusedVisionDriver(cfg, eng)
    assert drv.vopts.img_wire == "auto"
    fev = drv.init_frontend()
    errs = []
    for i in range(1, n + 1):
        it, iw, ia = _imu_window(cfg, sim, i)
        state, bank, fev, out = drv.step_stream(
            state, bank, fev, frames[i - 1], it, iw, ia, float(sim.cam_t_imu[i]))
        errs.append(float(jnp.linalg.norm(out.p - sim.gt_p[i])))
    # Guard tripped to the exact path on the float sub-quantum source...
    assert drv.vopts.img_wire == "f32" and drv.vopts.klt.sampler == "mm"
    # ...and tracking survived (the u8/bf16 modes measured 1.5-3.4 m here).
    assert max(errs) < 0.6, errs
    assert np.mean([int(np.sum(np.asarray(fev.valid)))]) > 15
