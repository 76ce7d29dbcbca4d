"""Pallas TPU kernels for the render hot path."""

from nerf_simple_tpu.kernels.mlp import (
    FusedWeights,
    pack_weights,
    fused_mlp_forward,
    fused_mlp,
    fused_train_step,
)

__all__ = [
    "FusedWeights",
    "pack_weights",
    "fused_mlp_forward",
    "fused_mlp",
    "fused_train_step",
]
