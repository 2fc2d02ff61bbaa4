"""Host-environment setup shared by every entry-point script.

The persistent XLA compile cache must be keyed by backend: with the axon
remote-compile tunnel active, CPU entries are AOT-compiled on the *server's*
microarchitecture (avx512/amx) and segfault (SIGILL) when this host later
loads them for a genuinely-local CPU run. One shared directory therefore
poisons local runs. Keying the directory by the requested platform string
keeps remote-compiled and locally-compiled artifacts separate.
"""

import hashlib
import os

import jax


def host_cpu_tag() -> str:
    """Short fingerprint of THIS host's CPU feature set.

    XLA:CPU AOT blobs embed the compile machine's features and are loaded
    with only a logged error on mismatch ("could lead to execution errors
    such as SIGILL") — a cache directory carried across a rig migration
    silently executes foreign-microarch code. Keying the dir by the host's
    cpuinfo flags forces a cold cache instead.
    """
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform

        flags = platform.processor() or "unknown"
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def cache_dir_for(tag: str) -> str:
    """Host-fingerprinted persistent-cache directory for a tool tag.

    Every cache directory carries the host fingerprint — including the
    accelerator tools' dirs: a JAX_PLATFORMS="axon,cpu" process writes
    XLA:CPU AOT entries (sim building, host eval) into the SAME directory as
    its TPU entries, and those CPU blobs are machine-specific (see
    host_cpu_tag). Round-5 measured consequence of the old shared dirs: the
    bench and MC tools were loading foreign-microarch AOT code after a rig
    migration. A migration now costs one cold compile instead.
    """
    return f"/tmp/jax_cache_ovplane_{tag}_{host_cpu_tag()}"


def setup_cache(tag: str = "") -> str:
    """Point the persistent compile cache at a backend-specific directory.

    Reads JAX_PLATFORMS from the environment (NOT jax.default_backend(),
    which would initialize the backend and can block on the remote tunnel).
    CPU directories additionally carry the host-CPU fingerprint (see
    host_cpu_tag) so locally-AOT-compiled artifacts never outlive the
    machine they were compiled for.
    """
    plat = (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0].strip() or "axon"
    path = f"/tmp/jax_cache_ovplane_{plat}{('_' + tag) if tag else ''}_{host_cpu_tag()}"
    jax.config.update("jax_compilation_cache_dir", path)
    return path
