"""Per-stage timing of the fused vision program on the accelerator.

Each stage is jitted standalone on the exact shapes of the fused step
(frontend/fused.py) with device-resident inputs, so a stage's time is
compute + one dispatch — the decomposition that told us where the fused
program's ~110 ms goes (BASELINE.md round 3).

Run (TPU): `timeout 1800 python examples/profile_fused_stages.py [B]`
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from ov_plane_tpu.utils.jaxenv import cache_dir_for
jax.config.update("jax_compilation_cache_dir", cache_dir_for("bench"))

import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend import fast as ffast
from ov_plane_tpu.frontend import klt as fklt
from ov_plane_tpu.frontend.fused import (
    FusedFrontendState,
    FusedVisionDriver,
    _solve_tracks,
    fused_vision_step,
)
from ov_plane_tpu.frontend.ransac import gyro_ransac
from ov_plane_tpu.models.feature_bank import FeatureBank
from ov_plane_tpu.models.manager import FrameData, VioEngine, init_state_with_gt, step
from ov_plane_tpu.utils.config import sim_config


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    accel = None
    for plat in ("axon", "tpu", "gpu"):
        try:
            if jax.devices(plat):
                accel = jax.devices(plat)[0]
                break
        except RuntimeError:
            continue
    accel = accel or jax.devices()[0]
    print(f"device: {accel}  B={B}")

    cfg = sim_config()
    cfg.state.max_slam_features = 0
    cfg.state.use_plane_constraint = True
    cfg.state.use_plane_slam_feats = True
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 15
    cfg.num_pts_plane = 40
    cfg.cam_wh = [640, 480]
    cfg.cam_intrinsics = [300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0]
    cfg.histogram_method = "NONE"
    cfg.tpu.max_features = 128
    cfg.tpu.max_obs_per_frame = 64
    cfg.tpu.max_msckf_update = 24
    # Info-form compression everywhere (classic + plane paths): the TPU QR
    # custom call is latency-bound in the column count regardless of rows;
    # the gram form is one MXU contraction + a [C,C] Cholesky (round-4
    # profile: the plane machinery was 79 ms of the 134 ms filter at B=32,
    # dominated by per-candidate QRs).
    cfg.tpu.use_info_compression = True
    eng = VioEngine.from_config(cfg)
    drv = FusedVisionDriver(cfg, eng)
    vo = drv.vopts
    rng = np.random.default_rng(0)
    put = lambda t: jax.device_put(t, accel)

    def timeit(name, fn, *args, reps=4):
        # Two axon-relay gotchas: (a) block_until_ready returns immediately
        # (async futures) — only a device->host pull actually waits, so each
        # timing includes ONE ~30 ms pull round trip; (b) the relay memoizes
        # identical (executable, inputs) pairs — every rep perturbs the first
        # float input so the execution is genuine.
        def run(k):
            a = list(args)
            a[0] = jax.tree.map(
                lambda v: v + jnp.float32(1e-6 * (k + 1))
                if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, a[0])
            out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            return out
        out = run(0)
        ts = []
        for k in range(reps):
            t0 = time.perf_counter()
            out = run(k + 1)
            ts.append(time.perf_counter() - t0)
        print(f"{name:36s} {1e3 * float(np.min(ts)):8.1f} ms  (incl ~30 ms pull RTT)")
        return out

    def batched(f):
        return jax.jit(jax.vmap(f)) if B > 1 else jax.jit(f)

    def mk(shape, dtype=np.float32, lo=0.0, hi=1.0):
        sh = (B, *shape) if B > 1 else shape
        return put(jnp.asarray(rng.uniform(lo, hi, sh), dtype))

    img = mk((vo.h, vo.w))
    # 1. preprocess + pyramid + preparation.
    pyr_fn = batched(lambda im: fklt.prepare_pyramid(
        tuple(fklt.build_pyramid(im, vo.klt.levels)), vo.klt.window))
    pyr = timeit("pyramid build+prepare", pyr_fn, img)
    img2 = mk((vo.h, vo.w))
    pyr2 = pyr_fn(img2)
    jax.block_until_ready(jax.tree.leaves(pyr2)[0])

    # 2. KLT track cap features.
    pts = mk((vo.cap, 2), lo=30.0, hi=400.0)
    msk = put(jnp.ones((B, vo.cap) if B > 1 else (vo.cap,), bool))
    tr_fn = (jax.jit(jax.vmap(lambda a, b, p, m: fklt.track(a, b, p, m, vo.klt)))
             if B > 1 else jax.jit(lambda a, b, p, m: fklt.track(a, b, p, m, vo.klt)))
    timeit("KLT track (fwd+bwd, 4 levels)", tr_fn, pyr, pyr2, pts, msk)

    # 3. FAST detect_grid.
    det_fn = batched(lambda im, p, m: ffast.detect_grid(im, p, m, vo.fast, vo.h, vo.w))
    timeit("FAST grid detect", det_fn, img, pts, msk)

    # 4. gyro RANSAC.
    uvn1 = mk((vo.cap, 2), lo=-0.8, hi=0.8)
    uvn2 = mk((vo.cap, 2), lo=-0.8, hi=0.8)
    R = put(jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1)) if B > 1 else jnp.eye(3, dtype=jnp.float32))
    rs_fn = (jax.jit(jax.vmap(lambda a, b, m, r: gyro_ransac(a, b, m, r, vo.ransac)))
             if B > 1 else jax.jit(lambda a, b, m, r: gyro_ransac(a, b, m, r, vo.ransac)))
    timeit("gyro 2-pt RANSAC", rs_fn, uvn1, uvn2, msk, R)

    # 5. whole-track solve + gates (incl. eigvalsh cond).
    fev1 = FusedFrontendState.create(vo)
    if B > 1:
        fev1 = jax.tree.map(lambda x: jnp.stack([x] * B), fev1)
    fev1 = put(fev1)
    R3 = put(jnp.eye(3, dtype=jnp.float32))
    p3v = put(jnp.zeros(3, jnp.float32))
    sv_fn = (jax.jit(jax.vmap(lambda f: _solve_tracks(f, vo, R3, p3v)))
             if B > 1 else jax.jit(lambda f: _solve_tracks(f, vo, R3, p3v)))
    timeit("tri solve + gates (eigvalsh)", sv_fn, fev1)

    # 6. filter step alone on the same shapes.
    state = init_state_with_gt(eng, cfg, t0=0.0, q0=jnp.asarray([0.0, 0, 0, 1]),
                               p0=jnp.zeros(3), v0=jnp.zeros(3), bg0=jnp.zeros(3),
                               ba0=jnp.zeros(3), dtype=jnp.float32)
    bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones, dtype=jnp.float32)
    W = cfg.tpu.max_imu_per_frame
    frame = FrameData(
        imu_t=jnp.asarray(np.linspace(0, 0.05, W), jnp.float32),
        imu_w=jnp.zeros((W, 3), jnp.float32),
        imu_a=jnp.tile(jnp.asarray([0.0, 0, 9.81], jnp.float32), (W, 1)),
        t_new=jnp.float32(0.05),
        obs_id=jnp.where(jnp.arange(64) < 40, jnp.arange(64), -1).astype(jnp.int32),
        obs_uv=jnp.asarray(rng.uniform(50, 400, (64, 2)), jnp.float32),
        obs_plane=jnp.full(64, -1, jnp.int32),
        merge_from=jnp.full(8, -1, jnp.int32), merge_into=jnp.full(8, -1, jnp.int32),
    )
    if B > 1:
        state = jax.tree.map(lambda x: jnp.stack([x] * B), state)
        bank = jax.tree.map(lambda x: jnp.stack([x] * B), bank)
        frame = jax.tree.map(lambda x: jnp.stack([x] * B), frame)
    state, bank, frame = put(state), put(bank), put(frame)
    st_fn = (jax.jit(jax.vmap(lambda s, b, f: step(eng, s, b, f)[2].p))
             if B > 1 else jax.jit(lambda s, b, f: step(eng, s, b, f)[2].p))
    timeit("filter step (manager.step)", st_fn, state, bank, frame)

    # 6b. filter-step ablations: bound the internal split without new
    # instrumentation — planes OFF isolates the CP machinery (delayed init
    # RANSAC + merges + grouped plane updates); a 4-feature MSCKF cap bounds
    # the classic-update share; the IMU window at the true sample count
    # bounds the masked-propagation overhead.
    import copy as _copy

    cfg_np = _copy.deepcopy(cfg)
    cfg_np.state.use_plane_constraint = False
    cfg_np.state.use_plane_slam_feats = False
    eng_np = VioEngine.from_config(cfg_np)
    np_fn = (jax.jit(jax.vmap(lambda s, b, f: step(eng_np, s, b, f)[2].p))
             if B > 1 else jax.jit(lambda s, b, f: step(eng_np, s, b, f)[2].p))
    timeit("filter step, planes OFF", np_fn, state, bank, frame)

    cfg_m4 = _copy.deepcopy(cfg)
    cfg_m4.tpu.max_msckf_update = 4
    eng_m4 = VioEngine.from_config(cfg_m4)
    m4_fn = (jax.jit(jax.vmap(lambda s, b, f: step(eng_m4, s, b, f)[2].p))
             if B > 1 else jax.jit(lambda s, b, f: step(eng_m4, s, b, f)[2].p))
    timeit("filter step, msckf cap 4", m4_fn, state, bank, frame)

    cfg_np4 = _copy.deepcopy(cfg_np)
    cfg_np4.tpu.max_msckf_update = 4
    eng_np4 = VioEngine.from_config(cfg_np4)
    np4_fn = (jax.jit(jax.vmap(lambda s, b, f: step(eng_np4, s, b, f)[2].p))
              if B > 1 else jax.jit(lambda s, b, f: step(eng_np4, s, b, f)[2].p))
    timeit("filter step, planes OFF + cap 4", np4_fn, state, bank, frame)

    # 6c. finer floor arms (round 4): what remains under "planes OFF + cap 4"
    # — zero observations isolates the triage/bank ingest + ZUPT machinery
    # from the measurement update; bare propagate_and_clone is the absolute
    # floor (one cov congruence + clone scatter).
    frame0 = frame._replace(obs_id=jnp.full_like(frame.obs_id, -1))
    timeit("filter step, planes OFF, 0 obs", np_fn, state, bank, frame0)

    from ov_plane_tpu.state.propagator import propagate_and_clone

    noises_v = jnp.asarray([eng.sigma_w2, eng.sigma_a2, eng.sigma_wb2,
                            eng.sigma_ab2], jnp.float32)
    grav_v = jnp.asarray([0.0, 0.0, eng.gravity_mag], jnp.float32)

    def _pc(s, f):
        return propagate_and_clone(s, f.imu_t, f.imu_w, f.imu_a, f.t_new,
                                   noises_v, grav_v, eng.prop_opts)[0].cov

    pc_fn = jax.jit(jax.vmap(_pc)) if B > 1 else jax.jit(_pc)
    timeit("propagate+clone only", pc_fn, state, frame)

    # 7. the whole fused program for reference.
    fev2 = put(fev1)
    li = put(jnp.full((B, 64) if B > 1 else (64,), -1, jnp.int32))
    mf = put(jnp.full((B, 8) if B > 1 else (8,), -1, jnp.int32))
    tn = put(jnp.full((B,), 0.05, jnp.float32) if B > 1 else jnp.float32(0.05))
    if B > 1:
        fu_fn = jax.jit(jax.vmap(lambda s, b, f, im, it, iw, ia, t, l1, l2, m1, m2:
                                 fused_vision_step(eng, vo, s, b, f, im, it, iw, ia, t, l1, l2, m1, m2)[4]))
    else:
        fu_fn = jax.jit(lambda s, b, f, im, it, iw, ia, t, l1, l2, m1, m2:
                        fused_vision_step(eng, vo, s, b, f, im, it, iw, ia, t, l1, l2, m1, m2)[4])
    it_ = put(jnp.tile(jnp.asarray(np.linspace(0, 0.05, W), jnp.float32), (B, 1)) if B > 1
              else jnp.asarray(np.linspace(0, 0.05, W), jnp.float32))
    iw_ = put(jnp.zeros((B, W, 3) if B > 1 else (W, 3), jnp.float32))
    ia_ = put(jnp.tile(jnp.asarray([0.0, 0, 9.81], jnp.float32), (B, W, 1)) if B > 1
              else jnp.tile(jnp.asarray([0.0, 0, 9.81], jnp.float32), (W, 1)))
    timeit("FULL fused program", fu_fn, state, bank, fev2, img, it_, iw_, ia_, tn, li, li, mf, mf)


if __name__ == "__main__":
    main()
