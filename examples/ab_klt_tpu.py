"""A/B the KLT patch samplers on the accelerator (slice vs MXU matmul forms).

Times fklt.track alone on the fused step's exact shapes (640x480, 5 levels,
15x15 window, 8 iters, forward-only) for each sampler, then the FULL fused
vision program for the env-selected sampler. Run (TPU):

    timeout 3600 python examples/ab_klt_tpu.py [B] [samplers,comma,separated]
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

from ov_plane_tpu.frontend import klt as fklt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    samplers = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["slice", "mm", "mm_bf16", "rowmm", "rowmm_bf16"])
    accel = None
    for plat in ("axon", "tpu", "gpu"):
        try:
            if jax.devices(plat):
                accel = jax.devices(plat)[0]
                break
        except RuntimeError:
            continue
    accel = accel or jax.devices()[0]
    print(f"device: {accel}  B={B}", flush=True)

    h, w, cap, levels, win, iters = 480, 640, 64, 5, 7, 8
    rng = np.random.default_rng(0)
    put = lambda t: jax.device_put(t, accel)

    def mk_pyr(seed):
        img = jnp.asarray(rng.uniform(0, 1, (B, h, w)), jnp.float32)
        fn = jax.jit(jax.vmap(lambda im: fklt.prepare_pyramid(
            tuple(fklt.build_pyramid(im, levels)), win)))
        out = fn(put(img))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return out

    pyr0 = mk_pyr(0)
    pyr1 = mk_pyr(1)
    pts = put(jnp.asarray(rng.uniform(30, 400, (B, cap, 2)), jnp.float32))
    msk = put(jnp.ones((B, cap), bool))

    for sampler in samplers:
        opts = fklt.KltOptions(levels=levels, window=win, iters=iters,
                               fb_check=False, sampler=sampler)
        fn = jax.jit(jax.vmap(lambda a, b, p, m: fklt.track(a, b, p, m, opts)))
        t0 = time.time()
        out = fn(pyr0, pyr1, pts, msk)
        np.asarray(out[0]).ravel()[:1]
        print(f"  {sampler:12s} compile+run {time.time()-t0:7.1f}s", flush=True)
        ts = []
        for k in range(4):
            # Perturb an input each rep (the relay memoizes identical pairs).
            p2 = pts + jnp.float32(1e-3 * (k + 1))
            t0 = time.perf_counter()
            out = fn(pyr0, pyr1, p2, msk)
            np.asarray(out[0]).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        print(f"  {sampler:12s} {1e3 * float(np.min(ts)):8.1f} ms "
              f"(incl ~30 ms pull RTT)  ok={int(np.asarray(out[1]).sum())}",
              flush=True)


if __name__ == "__main__":
    main()
