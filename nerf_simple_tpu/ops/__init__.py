"""Pure-jnp math ops: encoding, camera rays, poses, sampling, compositing."""

from nerf_simple_tpu.ops.encoding import gamma, positional_encoder
from nerf_simple_tpu.ops.rays import (
    camera_ray_dirs,
    rays_for_poses,
    spherical_to_pose,
    orbit_poses,
)
from nerf_simple_tpu.ops.sampling import stratified_ts, importance_ts
from nerf_simple_tpu.ops.volume import composite

__all__ = [
    "gamma",
    "positional_encoder",
    "camera_ray_dirs",
    "rays_for_poses",
    "spherical_to_pose",
    "orbit_poses",
    "stratified_ts",
    "importance_ts",
    "composite",
]
