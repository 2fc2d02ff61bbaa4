"""Host-environment setup shared by every entry-point script.

The persistent XLA compile cache must be keyed by backend: with the axon
remote-compile tunnel active, CPU entries are AOT-compiled on the *server's*
microarchitecture (avx512/amx) and segfault (SIGILL) when this host later
loads them for a genuinely-local CPU run. One shared directory therefore
poisons local runs. Keying the directory by the requested platform string
keeps remote-compiled and locally-compiled artifacts separate.
"""

import os

import jax


def setup_cache(tag: str = "") -> str:
    """Point the persistent compile cache at a backend-specific directory.

    Reads JAX_PLATFORMS from the environment (NOT jax.default_backend(),
    which would initialize the backend and can block on the remote tunnel).
    """
    plat = (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0].strip() or "axon"
    path = f"/tmp/jax_cache_ovplane_{plat}{('_' + tag) if tag else ''}"
    jax.config.update("jax_compilation_cache_dir", path)
    return path
