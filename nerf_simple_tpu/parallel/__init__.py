"""Multi-chip parallelism: device mesh + sharding construction.

The reference has no distributed support of any kind (single bare
``.cuda()`` device, train.py:41; SURVEY.md §2). The TPU-native backend is
SPMD: a 1-D ``data`` mesh, ray batches sharded over it, parameters
replicated, and gradient all-reduce inserted by XLA over ICI under jit —
no hand-written collectives anywhere.
"""

from nerf_simple_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
