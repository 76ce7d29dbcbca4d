"""Multi-host (multi-process) launch scaffolding.

The reference is strictly single-process/single-GPU (SURVEY.md §2: no
torch.distributed/NCCL/MPI anywhere). The TPU-native equivalent of a
"distributed backend" is jax.distributed + SPMD over a global device
mesh: after ``initialize()``, ``jax.devices()`` spans every host's chips,
the same ``Mesh``/``shard_map`` code that runs single-host runs globally,
and gradient reductions ride ICI within a slice / DCN across slices with
zero user-visible comms code.

Launch recipe (one command per host):

    JAX_COORDINATOR=host0:12345 NPROC=4 PROC_ID=<0..3> \
        python train.py --config_path cfg.yaml

with ``distributed: true`` in the YAML — train() calls
``maybe_initialize()`` before touching any array. On Cloud TPU pods,
plain ``jax.distributed.initialize()`` auto-discovers all four values
from the TPU metadata server, so the env vars are only needed off-pod
(e.g. the CPU-backed 2-process test, tests/test_distributed.py).

Dataset placement: with ``shard_dataset: true`` the HBM-resident ray/pixel
tensors are sharded over the ``data`` mesh axis instead of replicated —
each chip holds and samples only its 1/n slice (per-chip batch indices are
drawn against the local shard inside shard_map, so no gather crosses
chips). This divides dataset HBM by the mesh size at the cost of each
chip sampling from a fixed subset — the standard per-host data-sharding
trade, and statistically equivalent for shuffled ray datasets.
"""

from __future__ import annotations

import os


def maybe_initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Values fall back to the ``JAX_COORDINATOR`` / ``NPROC`` / ``PROC_ID``
    environment variables; with none present (or NPROC=1) this is a
    no-op returning False — single-process runs pay nothing.

    On TPU pods all three may be omitted entirely (auto-discovery); set
    ``NPROC`` alone to force auto-discovered initialization.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR"
    )
    if num_processes is None and "NPROC" in os.environ:
        num_processes = int(os.environ["NPROC"])
    if process_id is None and "PROC_ID" in os.environ:
        process_id = int(os.environ["PROC_ID"])

    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def global_batch_array(mesh, local_data, axis: str = "data"):
    """Assemble a global ``data``-sharded array from per-process host data.

    Each process passes ITS slice of the leading axis (the slices
    concatenated over process_index order form the global array); the
    result is a jax.Array sharded over ``axis`` whose addressable shards
    live on this process's devices only. Single-process: equivalent to a
    sharded device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_data)
