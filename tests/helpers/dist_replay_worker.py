"""Worker process for tests/test_distributed.py: joins a 2-process JAX world
on the CPU backend and runs the data-parallel batched replay over the global
mesh. Launched with env set on the command line (sitecustomize initializes
JAX at interpreter boot — see .claude/skills/verify/SKILL.md):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        XLA_FLAGS=--xla_force_host_platform_device_count=2 \
        python dist_replay_worker.py <pid> <nproc> <port> <out.npz>

Writes: fleet_rmse (replicated scalar), this process's addressable p-shards
and their global batch indices.
"""

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from ov_plane_tpu.parallel.distributed import (  # noqa: E402  (must init first)
    global_mesh,
    init_process,
    process_batch_to_global,
    replicate_from_local,
)

pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
init_process(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ov_plane_tpu.utils.jaxenv import cache_dir_for
jax.config.update("jax_compilation_cache_dir", cache_dir_for("dist"))

from ov_plane_tpu.models.feature_bank import FeatureBank  # noqa: E402
from ov_plane_tpu.models.manager import VioEngine, init_state_with_gt  # noqa: E402
from ov_plane_tpu.parallel.replay import batched_replay  # noqa: E402
from tests.helpers.dist_replay_config import make_cfg_sim  # noqa: E402

assert len(jax.devices()) == nproc * len(jax.local_devices()), "mesh does not span processes"

cfg, sim = make_cfg_sim()
eng = VioEngine.from_config(cfg)
st = init_state_with_gt(
    eng, cfg, t0=sim.cam_t_imu[0], q0=sim.gt_q[0], p0=sim.gt_p[0], v0=sim.gt_v[0],
    bg0=sim.gt_bg_cam[0], ba0=sim.gt_ba_cam[0],
)
bk = FeatureBank.create(cfg.tpu.max_features, eng.layout.max_clones)

B_local = len(jax.local_devices())
states_l = jax.tree.map(lambda x: np.stack([np.asarray(x)] * B_local), st)
banks_l = jax.tree.map(lambda x: np.stack([np.asarray(x)] * B_local), bk)

mesh = global_mesh("seq")
states_b = process_batch_to_global(states_l, mesh, "seq")
banks_b = process_batch_to_global(banks_l, mesh, "seq")
sim_r = replicate_from_local(sim, mesh)

outs, fleet_rmse = batched_replay(eng, states_b, banks_b, sim_r, cfg.tpu.max_imu_per_frame, mesh)

shards = sorted(outs.p.addressable_shards, key=lambda s: s.index[0].start or 0)
np.savez(
    out_path,
    fleet_rmse=np.asarray(fleet_rmse),
    p_local=np.stack([np.asarray(s.data) for s in shards]),
    batch_idx=np.asarray([s.index[0].start or 0 for s in shards]),
    n_global_devices=len(jax.devices()),
)
print(f"worker {pid}: ok fleet_rmse={float(fleet_rmse):.5f}", flush=True)
