"""Filter checkpoint / resume.

The reference has no state serialization (SURVEY.md §5.4); multi-host batch
jobs need it, and with the whole filter state being a pytree of arrays it is
a single orbax (or npz fallback) save/restore.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_npz(path: str, state, bank) -> None:
    """Flat-npz checkpoint (works everywhere, host-local)."""
    flat_s, _ = jax.tree_util.tree_flatten_with_path(state)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(bank)
    payload = {}
    for prefix, flat in (("state", flat_s), ("bank", flat_b)):
        for path_keys, leaf in flat:
            key = prefix + "/" + "/".join(str(k) for k in path_keys)
            payload[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **payload)


def load_npz(path: str, state_template, bank_template) -> Tuple[Any, Any]:
    data = np.load(path)

    def restore(template, prefix):
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for path_keys, leaf in flat:
            key = prefix + "/" + "/".join(str(k) for k in path_keys)
            arr = jnp.asarray(data[key], dtype=leaf.dtype)
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return restore(state_template, "state"), restore(bank_template, "bank")


def save_orbax(directory: str, state, bank) -> None:
    """Orbax checkpoint (multi-host friendly)."""
    if not _HAVE_ORBAX:  # pragma: no cover
        raise RuntimeError("orbax not available; use save_npz")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), {"state": state, "bank": bank}, force=True)
    ckptr.wait_until_finished()


def load_orbax(directory: str, state_template, bank_template):
    if not _HAVE_ORBAX:  # pragma: no cover
        raise RuntimeError("orbax not available; use load_npz")
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(directory), {"state": state_template, "bank": bank_template}
    )
    return restored["state"], restored["bank"]
