"""Model families: the NeRF MLP (coarse/fine) as functional pytree models."""

from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params, nerf_apply

__all__ = ["NerfMLP", "init_nerf_params", "nerf_apply"]
