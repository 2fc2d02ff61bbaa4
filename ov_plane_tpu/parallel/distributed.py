"""Multi-process launch wiring for the data-parallel replay (SURVEY.md §5.8).

The reference is a single-process system with no compute communication; this
layer is new architecture (SURVEY §2.4): one JAX process per host, a global
``seq`` mesh spanning every process's devices, and the per-process sequence
batches assembled into global sharded arrays. The same code path drives

* multi-host TPU pods (``jax.distributed.initialize`` picks up the TPU
  coordinator automatically when launched by the pod runtime),
* explicit N-process launches (coordinator address + process id given), and
* the 2-process CPU-backend test on one machine
  (``tests/test_distributed.py``), which uses gloo CPU collectives.

Every collective in the replay (the fleet-metric psum, the sharded Schur
reductions) rides the same mesh, so proving the mesh spans processes proves
the communication path end to end.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_process(coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None,
                 cpu_collectives: str = "gloo") -> None:
    """Join (or create) the multi-process JAX world.

    Must run before any other JAX call in the process. With no arguments,
    defers to the environment (TPU pod metadata / JAX_COORDINATOR_ADDRESS);
    explicit arguments support bare-metal N-process launches. On the CPU
    backend, cross-process collectives need a collectives implementation —
    gloo is compiled into jaxlib and is what the 2-process test uses.
    """
    try:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    except Exception:
        pass  # flag renamed/absent: TPU paths don't need it
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "seq") -> Mesh:
    """One-axis mesh over every device in the (multi-process) world."""
    return Mesh(np.array(jax.devices()), axis_names=(axis,))


def process_batch_to_global(tree, mesh: Mesh, axis: str = "seq"):
    """Assemble per-process batch shards into global arrays.

    Each process passes its LOCAL leading-axis slab (local_batch =
    global_batch / num_processes, in process-id order); the result is one
    global array sharded over `axis`.
    """

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), x)

    return jax.tree.map(put, tree)


def replicate_from_local(tree, mesh: Mesh):
    """Replicate identical per-process data (e.g. a deterministic measurement
    stream) as fully-replicated global arrays."""

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*([None] * x.ndim))), x)

    return jax.tree.map(put, tree)
