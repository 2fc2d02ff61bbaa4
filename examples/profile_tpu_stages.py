"""On-device stage breakdown of the bench step (tunnel-safe profiler).

The axon remote tunnel precludes a device-side jax.profiler timeline, so this
times each pipeline stage as its own jitted program on the bench's exact
shapes (B=64 Monte-Carlo batch, f32, point-only MSCKF), with distinct inputs
per repetition (the relay memoizes identical (executable, input) pairs).

Stage timings do not sum exactly to the fused-step time — XLA fuses across
stage boundaries inside the full program — but they rank the bottlenecks,
which is what the Pallas/optimization work needs (BASELINE.md bottleneck
analysis; reference per-stage protocol: VioManager.cpp:879-928 timing CSV).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("OVP_DISABLE_PALLAS", "1")
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

from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.manager import (FrameData, VioEngine, init_state_with_gt,
                                         run_sequence, step, triage)
from ov_plane_tpu.models.msckf import msckf_update
from ov_plane_tpu.ops import cams
from ov_plane_tpu.sim.simulator import NoiseParams, apply_noise, build_sim
from ov_plane_tpu.state.propagator import propagate_and_clone
from ov_plane_tpu.utils.config import sim_config

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
REPS = int(os.environ.get("PROF_REPS", "4"))
WARM_FRAMES = 40


def bench_config():
    cfg = sim_config()
    cfg.sim.traj_duration = 30.0
    cfg.state.max_slam_features = 0
    cfg.state.do_calib_camera_pose = False
    cfg.state.do_calib_camera_intrinsics = False
    cfg.state.do_calib_camera_timeoffset = False
    cfg.num_pts = 60
    cfg.num_pts_plane = 0
    cfg.tpu.max_features = 192
    cfg.tpu.max_obs_per_frame = 96
    cfg.tpu.max_msckf_update = 40
    cfg.tpu.use_info_compression = True
    return cfg


def timeit(label, fn, variants, n_frames_equiv=1.0):
    """Call fn on each prepared input variant; report min wall (post-warmup)."""
    fn(*variants[0])  # compile
    jax.block_until_ready(fn(*variants[0]))
    times = []
    for v in variants[1:]:
        t0 = time.time()
        jax.block_until_ready(fn(*v))
        times.append(time.time() - t0)
    best = min(times)
    print(f"  {label:34s} {best * 1e3:9.2f} ms   ({BATCH * n_frames_equiv / best:9.0f} frames/s agg)",
          flush=True)
    return best


def main():
    cfg = bench_config()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
    sim = jax.tree.map(lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, sim)

    accel = None
    for plat in ("axon", "tpu", "gpu", "cpu"):
        try:
            devs = jax.devices(plat)
            if devs:
                accel = devs[0]
                break
        except RuntimeError:
            continue
    print(f"[profile] device: {accel}", flush=True)
    sim = jax.device_put(sim, accel)
    eng = VioEngine.from_config(cfg)
    lay = eng.layout
    print(f"[profile] state dim D={lay.dim}, B={BATCH}, "
          f"imu_window={cfg.tpu.max_imu_per_frame}, M={cfg.tpu.max_msckf_update}")

    noise = NoiseParams(
        sigma_w=cfg.imu_noises.sigma_w, sigma_a=cfg.imu_noises.sigma_a,
        sigma_wb=cfg.imu_noises.sigma_wb, sigma_ab=cfg.imu_noises.sigma_ab,
        sigma_pix=cfg.msckf_options.sigma_pix, dt_imu=1.0 / cfg.sim.freq_imu,
    )
    dt = jnp.float32

    # --- Warm-up replay to a representative mid-sequence (state, bank). ---
    def warm(key):
        sim_k = apply_noise(sim, key, noise)
        st = init_state_with_gt(
            eng, cfg, t0=sim_k.cam_t_imu[0], q0=sim_k.gt_q[0], p0=sim_k.gt_p[0],
            v0=sim_k.gt_v[0], bg0=sim_k.gt_bg_cam[0], ba0=sim_k.gt_ba_cam[0], dtype=dt,
        )
        bk = fb.FeatureBank.create(cfg.tpu.max_features, lay.max_clones, dtype=dt)
        pre = jax.tree.map(lambda x: x[: WARM_FRAMES + 1] if x.ndim and x.shape[0] == sim.cam_t_imu.shape[0] else x, sim_k)
        st, bk, _ = run_sequence(eng, st, bk, pre, imu_window=cfg.tpu.max_imu_per_frame)
        return st, bk, sim_k

    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(7), BATCH), accel)
    print("[profile] warm-up replay (compile + run)...", flush=True)
    t0 = time.time()
    states, banks, sims = jax.jit(jax.vmap(warm))(keys)
    jax.block_until_ready(states.imu)
    print(f"[profile] warmed in {time.time() - t0:.1f}s", flush=True)

    i = WARM_FRAMES + 1
    W = cfg.tpu.max_imu_per_frame

    def frame_at(sim_k, i):
        start = sim_k.imu_window_start[i]
        z = jnp.zeros((), start.dtype)
        return FrameData(
            imu_t=jax.lax.dynamic_slice(sim_k.imu_t, (start,), (W,)),
            imu_w=jax.lax.dynamic_slice(sim_k.imu_w, (start, z), (W, 3)),
            imu_a=jax.lax.dynamic_slice(sim_k.imu_a, (start, z), (W, 3)),
            t_new=sim_k.cam_t[i],
            obs_id=sim_k.obs_id[i], obs_uv=sim_k.obs_uv[i], obs_plane=sim_k.obs_plane[i],
            obs_gt_p=sim_k.obs_gt_p[i], obs_gt_cp=sim_k.obs_gt_cp[i],
        )

    frames = jax.jit(jax.vmap(lambda s: frame_at(s, i)))(sims)
    jax.block_until_ready(frames.imu_t)

    # Distinct input variants per repetition (dodge relay memoization).
    def perturb(states, k):
        return states.replace(imu=states.imu + 1e-7 * (k + 1))

    variants = [(jax.tree.map(lambda x: x, perturb(states, k)), banks, frames)
                for k in range(REPS + 1)]
    for v in variants:
        jax.block_until_ready(v[0].imu)

    noises_v = jnp.asarray([eng.sigma_w2, eng.sigma_a2, eng.sigma_wb2, eng.sigma_ab2], dt)
    gravity = jnp.asarray([0.0, 0.0, eng.gravity_mag], dt)

    print(f"[profile] timing ({REPS} reps, min reported):", flush=True)

    # 1. Full step.
    f_step = jax.jit(jax.vmap(lambda st, bk, fr: step(eng, st, bk, fr)[0].imu))
    t_step = timeit("full step", f_step, variants)

    # 2. Propagate + clone only.
    f_prop = jax.jit(jax.vmap(
        lambda st, bk, fr: propagate_and_clone(
            st, fr.imu_t, fr.imu_w, fr.imu_a, fr.t_new, noises_v, gravity, eng.prop_opts)[0].imu))
    t_prop = timeit("propagate+clone", f_prop, variants)

    # 3. Undistort + ingest.
    def ingest_only(st, bk, fr):
        zeta = st.cam_zeta
        obs_finite = jnp.all(jnp.isfinite(fr.obs_uv), axis=1)
        obs_id = jnp.where(obs_finite, fr.obs_id, -1)
        obs_uv = jnp.where(obs_finite[:, None], fr.obs_uv, 0.0)
        uvn = jax.vmap(lambda uv: cams.undistort(uv, zeta, eng.cam_model))(obs_uv)
        bk = fb.ingest(bk, obs_id, obs_uv, uvn, fr.obs_plane, st.newest_clone_slot,
                       gt_p=fr.obs_gt_p, gt_cp=fr.obs_gt_cp)
        return bk.uv

    f_ing = jax.jit(jax.vmap(ingest_only))
    timeit("undistort+ingest", f_ing, variants)

    # 4. Triage.
    f_tri = jax.jit(jax.vmap(
        lambda st, bk, fr: triage(eng, st, bk, st.newest_clone_slot, jnp.asarray(True))[0]))
    timeit("triage (top_k selection)", f_tri, variants)

    # 5. MSCKF update (triage inputs recomputed inside; matches step 6b wiring).
    def msckf_only(st, bk, fr):
        sel_idx, sel_valid, _, _ = triage(eng, st, bk, st.newest_clone_slot, jnp.asarray(True))
        sel_uv = bk.uv[sel_idx]
        sel_uvn = bk.uvn[sel_idx]
        sel_mask = bk.mask[sel_idx] & sel_valid[:, None]
        P = st.plane_cp.shape[0]
        zcp = jnp.zeros_like(st.plane_cp[jnp.zeros(sel_idx.shape[0], jnp.int32)])
        no_plane = jnp.zeros(sel_idx.shape[0], bool)
        new_state, used, _, _ = msckf_update(
            st, eng.msckf_opts, sel_uv, sel_uvn, sel_mask,
            zcp, zcp, no_plane, no_plane, jnp.zeros(sel_idx.shape[0], jnp.int32))
        return new_state.imu

    f_msckf = jax.jit(jax.vmap(msckf_only))
    t_msckf = timeit("triage+MSCKF update", f_msckf, variants)

    print(f"[profile] step {t_step*1e3:.1f} ms vs prop {t_prop*1e3:.1f} + msckf {t_msckf*1e3:.1f}")


if __name__ == "__main__":
    main()
