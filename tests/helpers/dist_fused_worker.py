"""Worker for the 2-process FUSED vision test (VERDICT r3 #6): joins the JAX
world, builds the global dp mesh, and drives the fused one-dispatch vision
step over process-spanning sharded streams. Each process hosts its local
plane trackers and ships only its local image/payload slab.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        XLA_FLAGS=--xla_force_host_platform_device_count=2 \
        python dist_fused_worker.py <pid> <nproc> <port> <out.npz>
"""

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from ov_plane_tpu.parallel.distributed import (  # noqa: E402  (init first)
    global_mesh,
    init_process,
    process_batch_to_global,
)

pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
init_process(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ov_plane_tpu.utils.jaxenv import cache_dir_for
jax.config.update("jax_compilation_cache_dir", cache_dir_for("dist"))

from ov_plane_tpu.frontend.fused import FusedVisionDriver  # noqa: E402
from ov_plane_tpu.models.feature_bank import FeatureBank  # noqa: E402
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt  # noqa: E402
from tests.helpers.dist_fused_config import (  # noqa: E402
    B_GLOBAL,
    N_FRAMES,
    imu_window,
    make_cfg_sim_frames,
)

cfg, sim, imgs = make_cfg_sim_frames()
B_l = B_GLOBAL // nproc
lo, hi = pid * B_l, (pid + 1) * B_l

eng = VioEngine.from_config(cfg)
state = init_state_with_gt(
    eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
    bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0])
bank = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)

mesh = global_mesh("dp")
drv = FusedVisionDriver(cfg, eng, batch=B_GLOBAL, mesh=mesh)
fev = drv.init_frontend()

tile_l = lambda x: jax.tree.map(lambda v: np.stack([np.asarray(v)] * B_l), x)
states = process_batch_to_global(tile_l(state), mesh, "dp")
banks = process_batch_to_global(tile_l(bank), mesh, "dp")
fevs = process_batch_to_global(tile_l(fev), mesh, "dp")

for i in range(1, N_FRAMES + 1):
    it, iw, ia = imu_window(cfg, sim, i)
    states, banks, fevs, out = drv.step_batch(
        states, banks, fevs, imgs[i - 1][lo:hi],
        np.tile(it, (B_l, 1)), np.tile(iw, (B_l, 1, 1)), np.tile(ia, (B_l, 1, 1)),
        np.full(B_l, float(sim.cam_t_imu[i])))
drv.flush_stream()

shards = sorted(out.p.addressable_shards, key=lambda s: s.index[0].start or 0)
qshards = sorted(out.q.addressable_shards, key=lambda s: s.index[0].start or 0)
np.savez(
    out_path,
    p_local=np.concatenate([np.asarray(s.data) for s in shards], axis=0),
    q_local=np.concatenate([np.asarray(s.data) for s in qshards], axis=0),
    batch_lo=lo,
    n_global_devices=len(jax.devices()),
    n_tracked=int(np.sum(drv.last_dbg is not None and 1)),
)
print(f"fused worker {pid}: ok", flush=True)
