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


def _topology_order(devices) -> list:
    """Order devices slice-major for multi-slice (DCN-connected) jobs.

    On a multi-slice TPU deployment, chips within a slice are linked by
    ICI while slices talk over DCN. Laying the ``data`` axis out
    slice-major keeps each contiguous run of the gradient all-reduce ring
    inside a slice, so XLA's hierarchical collective does the bulk of the
    reduction over ICI and crosses DCN only once per slice — the
    scaling-book recipe for hybrid ICI/DCN meshes. Single-slice (or CPU
    fake-device) jobs are returned unchanged: every device reports the
    same slice index.

    Sort keys: (slice_index, process_index, id) — all stable attributes
    of jax Devices; absent attributes default to 0.
    """
    return sorted(
        devices,
        key=lambda d: (
            getattr(d, "slice_index", 0) or 0,
            getattr(d, "process_index", 0) or 0,
            getattr(d, "id", 0) or 0,
        ),
    )


def make_mesh(
    num_data: int = -1, num_model: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``num_data=-1`` uses all devices.

    Devices are ordered slice-major (see ``_topology_order``) so that on
    multi-slice deployments the data-parallel gradient reduction is
    ICI-dominant with a single DCN hop per slice.
    """
    devices = devices if devices is not None else jax.devices()
    devices = _topology_order(devices)
    if num_data == -1:
        num_data = len(devices) // num_model
    n_slices = len({getattr(d, "slice_index", 0) or 0 for d in devices})
    if n_slices > 1 and num_data % n_slices:
        import warnings

        warnings.warn(
            f"data-mesh size {num_data} is not a multiple of the "
            f"{n_slices} slices; shards will straddle DCN boundaries "
            f"(gradient all-reduce loses its ICI-only fast path)",
            stacklevel=2,
        )
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
