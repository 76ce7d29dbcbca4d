"""Data layer: Blender-synthetic loader, device-resident ray datasets,
jitted batch sampling, and a procedural synthetic scene generator."""

from nerf_simple_tpu.data.blender import BlenderSplit, load_blender
from nerf_simple_tpu.data.dataset import RayDataset, sample_ray_batch

__all__ = ["BlenderSplit", "load_blender", "RayDataset", "sample_ray_batch"]
