"""Device-mesh helpers for data-parallel sweeps."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D ('data',) mesh over the first n (or all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (sequence-batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state: dict, mesh: Mesh) -> dict:
    """Place a fold-engine state pytree on the mesh, batch-sharded.

    Every array in the state has leading dim B; scalars replicate."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in state.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out
