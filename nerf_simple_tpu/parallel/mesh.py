"""Device mesh + sharding helpers.

Design (SURVEY.md §2 parallelism table):
- axis ``data``: ray-batch data parallelism — the only axis a ~600K-param
  NeRF needs. Gradients all-reduce over ICI automatically under jit.
- axis ``model``: reserved in the mesh signature for larger model families
  (size 1 by default); tensor parallelism is deliberately unused here.

Rays are embarrassingly parallel, so sharding the batch's leading axis is
a complete parallelization of training AND eval rendering: with params
replicated and the batch sharded, every matmul is local and the only
collective XLA inserts is the gradient psum.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int = -1, num_model: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``num_data=-1`` uses all devices."""
    devices = devices if devices is not None else jax.devices()
    if num_data == -1:
        num_data = len(devices) // num_model
    use = devices[: num_data * num_model]
    import numpy as np

    return Mesh(
        np.asarray(use).reshape(num_data, num_model), axis_names=("data", "model")
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray-batch) axis over ``data``; replicate others."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device_put arrays with their leading axis sharded over ``data``."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out
