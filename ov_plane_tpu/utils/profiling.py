"""Per-stage wall-clock profiling of the frame pipeline.

Equivalent of the reference's rT1..rT8 stage bracketing + timing CSV
(VioManager.cpp:97-119, 879-928 — SURVEY.md §5.1): the production path runs
the whole frame as one fused jitted step (no internal sync points), so
profiling uses this *staged* runner that invokes the same jitted sub-stage
functions with ``block_until_ready`` timers in between. Stage names match the
reference CSV columns so ``timing_custom``-style analysis carries over.

For kernel-level traces use ``jax.profiler.trace`` around the fused step
instead (perfetto/tensorboard).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ov_plane_tpu.eval.io import TimingRecorder
from ov_plane_tpu.models import feature_bank as fb
from ov_plane_tpu.models.manager import VioEngine, triage
from ov_plane_tpu.models.msckf import msckf_update
from ov_plane_tpu.ops import cams
from ov_plane_tpu.state.propagator import marginalize_oldest_clone, propagate_and_clone


def run_sequence_profiled(eng: VioEngine, state, bank, sim_data, imu_window: int,
                          max_frames: int | None = None) -> TimingRecorder:
    """Replay with per-stage timers (point/SLAM/plane sim path). Returns the
    TimingRecorder; steady-state rows only (first frames include compiles)."""
    rec = TimingRecorder()
    dtype = state.imu.dtype
    noises = jnp.asarray([eng.sigma_w2, eng.sigma_a2, eng.sigma_wb2, eng.sigma_ab2], dtype)
    gravity = jnp.asarray([0.0, 0.0, eng.gravity_mag], dtype)
    M = eng.max_msckf_batch
    n_frames = int(sim_data.cam_t_imu.shape[0]) - 1
    if max_frames:
        n_frames = min(n_frames, max_frames)

    def sync(x):
        jax.block_until_ready(x)
        return time.perf_counter()

    for i in range(1, n_frames + 1):
        stages = {}
        start = int(sim_data.imu_window_start[i])
        it = jax.lax.dynamic_slice(sim_data.imu_t, (start,), (imu_window,))
        iw = jax.lax.dynamic_slice(sim_data.imu_w, (start, 0), (imu_window, 3))
        ia = jax.lax.dynamic_slice(sim_data.imu_a, (start, 0), (imu_window, 3))

        t0 = time.perf_counter()
        state, slot = propagate_and_clone(state, it, iw, ia, sim_data.cam_t[i], noises, gravity, eng.prop_opts)
        t1 = sync(state.cov)
        stages["propagation"] = t1 - t0

        uvn = jax.vmap(lambda uv: cams.undistort(uv, state.cam_zeta, eng.cam_model))(sim_data.obs_uv[i])
        bank = fb.ingest(bank, sim_data.obs_id[i], sim_data.obs_uv[i], uvn, sim_data.obs_plane[i], slot)
        sel_idx, sel_valid, slam_idx, slam_valid = triage(eng, state, bank, slot, jnp.asarray(False))
        sel_valid = sel_valid & (state.num_clones >= eng.min_clones_to_update)
        t2 = sync(sel_valid)
        stages["tracking"] = t2 - t1

        z3 = jnp.zeros((M, 3), dtype)
        state, used, _, _ = msckf_update(
            state, eng.msckf_opts, bank.uv[sel_idx], bank.uvn[sel_idx],
            bank.mask[sel_idx] & sel_valid[:, None], z3, z3,
            jnp.zeros((M,), bool), jnp.zeros((M,), bool), jnp.zeros((M,), jnp.int32),
        )
        t3 = sync(state.cov)
        stages["msckf update"] = t3 - t2

        F = bank.fid.shape[0]
        consumed = jnp.zeros((F + 1,), bool).at[jnp.where(sel_valid, sel_idx, F)].set(True)[:F]
        bank = fb.free_rows(bank, consumed)
        ms = state.oldest_clone_slot
        over = state.num_clones > eng.max_clone_size
        state = marginalize_oldest_clone(state, eng.max_clone_size)
        bc = fb.clear_clone_column(bank, ms)
        bank = jax.tree.map(lambda a, b: jnp.where(over, a, b), bc, bank)
        t4 = sync(state.cov)
        stages["re-tri & marg"] = t4 - t3
        stages["total"] = t4 - t0
        rec.add(float(sim_data.cam_t_imu[i]), stages)
    return rec
