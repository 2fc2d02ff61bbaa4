"""Populate the /tmp MC frame caches on CPU (no TPU claim).

The textured host render of a full MC-vision cell costs 10-25 min on this
4-vCPU box; `run_mc_vision.render_frames` caches it under /tmp keyed by
(scene, density, n, resolution). /tmp does not survive the rig, so this
warm-up regenerates the caches ahead of a TPU campaign run so the chip-
holding process never pays the render wall.

Usage:
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/warm_mc_frames.py --scene tabletop
"""

import argparse
import os
import sys
import time

# CPU-only by construction: these must be set before `import jax` binds a
# backend, so the script never claims the shared TPU even when run without
# the documented env prefix. (sitecustomize may have already registered the
# axon plugin at interpreter boot; pinning JAX_PLATFORMS=cpu here still wins
# because the backend is chosen lazily at first use.)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

from run_mc_vision import render_frames, scene_config

from ov_plane_tpu.sim.simulator import build_sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="tabletop",
                    choices=["tabletop", "room", "corridor", "lowtex"])
    ap.add_argument("--densities", default="dense,sparse")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    for dense in [d.strip() == "dense" for d in args.densities.split(",")]:
        cfg, render = scene_config(args.scene, dense)
        t0 = time.time()
        sim = build_sim(cfg, max_obs=cfg.tpu.max_obs_per_frame)
        n = int(sim.cam_t_imu.shape[0]) - 1
        if args.max_frames:
            n = min(n, args.max_frames)
        render_frames(cfg, sim, render, n, scene=args.scene, dense=dense)
        print(f"[warm] {args.scene}/{'dense' if dense else 'sparse'}: "
              f"{n} frames in {time.time() - t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
