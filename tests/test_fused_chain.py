"""K-frame chained fused dispatch (FusedVisionDriver chain=K): one jitted
call advances K frames via lax.scan over the same fused step. Built to
amortize the remote tunnel's fixed ~3-RTT-per-dispatch cost (bench round 4);
must replay equivalently to the per-frame dispatch loop.

With planes OFF the host label arrays stay empty, so the chained dataflow is
the SAME computation as K sequential dispatches — equivalence is to f64
rounding. (With planes ON the only designed difference is label lag: K+1
frames instead of 2.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from ov_plane_tpu.frontend.fused import FusedVisionDriver

from test_fused import _imu_window, _setup


def _tile(x, B):
    return jax.tree.map(lambda v: jnp.stack([v] * B), x)


def test_fused_chain_matches_per_frame_dispatch():
    cfg, eng, state, bank, sim, frames, n = _setup()
    B, K = 2, 2
    n = (min(n, 8) // K) * K
    rng = np.random.default_rng(11)
    noise = rng.normal(0.0, 0.01, (B, *frames[0].shape)).astype(np.float32)

    def mk(i):
        return np.clip(frames[i - 1][None] + noise, 0.0, 1.0)

    # --- reference: per-frame dispatch loop --------------------------------
    drv1 = FusedVisionDriver(cfg, eng, batch=B)
    st, bk, fe = _tile(state, B), _tile(bank, B), _tile(drv1.init_frontend(), B)
    for i in range(1, n + 1):
        it, iw, ia = _imu_window(cfg, sim, i)
        st, bk, fe, out1 = drv1.step_batch(
            st, bk, fe, mk(i), np.tile(it, (B, 1)), np.tile(iw, (B, 1, 1)),
            np.tile(ia, (B, 1, 1)), np.full(B, float(sim.cam_t_imu[i])))
    drv1.flush_stream()
    p1, q1 = np.asarray(out1.p), np.asarray(out1.q)

    # --- chained: K frames per dispatch ------------------------------------
    drv2 = FusedVisionDriver(cfg, eng, batch=B, chain=K)
    st, bk, fe = _tile(state, B), _tile(bank, B), _tile(drv2.init_frontend(), B)
    counters = np.zeros(9)
    for c in range(n // K):
        wins = [_imu_window(cfg, sim, c * K + k + 1) for k in range(K)]
        it_c = np.stack([np.tile(w[0], (B, 1)) for w in wins])
        iw_c = np.stack([np.tile(w[1], (B, 1, 1)) for w in wins])
        ia_c = np.stack([np.tile(w[2], (B, 1, 1)) for w in wins])
        tn_c = np.stack([np.full(B, float(sim.cam_t_imu[c * K + k + 1]))
                         for k in range(K)])
        imgs = np.stack([mk(c * K + k + 1) for k in range(K)])
        st, bk, fe, outs = drv2.step_batch_chunk(
            st, bk, fe, imgs, it_c, iw_c, ia_c, tn_c)
        counters = counters + drv2.last_counters.sum(axis=0)
    drv2.flush_stream()
    # outs leaves are [K, B, ...]: the chunk's last frame is the final state.
    p2, q2 = np.asarray(outs.p[-1]), np.asarray(outs.q[-1])

    # The scanned body reassociates the f32 frontend math (same compile-level
    # effect as per-shard compilation in test_fused_batch_sharded_*): tracks
    # land within f32 rounding of the straight-line loop, so trajectories
    # match to ~1e-5, not bitwise.
    np.testing.assert_allclose(p2, p1, atol=1e-4)
    np.testing.assert_allclose(q2, q1, atol=1e-4)
    # The chained replay genuinely tracked (same bound as the batch test) and
    # the counter plumbing carried MSCKF activity out of the chunk pull.
    err = np.linalg.norm(p2[0] - np.asarray(sim.gt_p[n]))
    assert err < 0.5, err
    assert counters[3] > 0, "no MSCKF updates reported through chunk counters"


def test_fused_chain_staged_chunk_matches_raw():
    cfg, eng, state, bank, sim, frames, n = _setup()
    B, K = 2, 2
    n = (min(n, 4) // K) * K

    def run(staged):
        drv = FusedVisionDriver(cfg, eng, batch=B, chain=K)
        st, bk, fe = _tile(state, B), _tile(bank, B), _tile(drv.init_frontend(), B)
        for c in range(n // K):
            wins = [_imu_window(cfg, sim, c * K + k + 1) for k in range(K)]
            it_c = np.stack([np.tile(w[0], (B, 1)) for w in wins])
            iw_c = np.stack([np.tile(w[1], (B, 1, 1)) for w in wins])
            ia_c = np.stack([np.tile(w[2], (B, 1, 1)) for w in wins])
            tn_c = np.stack([np.full(B, float(sim.cam_t_imu[c * K + k + 1]))
                             for k in range(K)])
            imgs = np.stack([np.stack([frames[c * K + k]] * B) for k in range(K)])
            img_in = drv.stage_chunk(imgs) if staged else imgs
            st, bk, fe, outs = drv.step_batch_chunk(
                st, bk, fe, img_in, it_c, iw_c, ia_c, tn_c)
        drv.flush_stream()
        return np.asarray(outs.p[-1]), np.asarray(outs.q[-1])

    p_raw, q_raw = run(False)
    p_st, q_st = run(True)
    np.testing.assert_array_equal(p_st, p_raw)
    np.testing.assert_array_equal(q_st, q_raw)
