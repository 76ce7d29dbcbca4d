"""Pure-jnp math ops: encoding, camera rays, poses, sampling, compositing."""

from nerf_simple_tpu.ops.encoding import (
    contract_gaussian,
    gamma,
    gamma_ipe,
    positional_encoder,
    scene_contraction,
)
from nerf_simple_tpu.ops.rays import (
    camera_ray_dirs,
    mip_ray_radii,
    orbit_poses,
    rays_for_poses,
    rays_for_poses_scaled,
    spherical_to_pose,
)
from nerf_simple_tpu.ops.sampling import (
    conical_gaussian,
    importance_ts,
    resample_edges,
    stratified_ts,
    stratified_ts_spaced,
)
from nerf_simple_tpu.ops.volume import composite, composite_intervals

__all__ = [
    "contract_gaussian",
    "gamma",
    "gamma_ipe",
    "positional_encoder",
    "scene_contraction",
    "camera_ray_dirs",
    "mip_ray_radii",
    "orbit_poses",
    "rays_for_poses",
    "rays_for_poses_scaled",
    "spherical_to_pose",
    "conical_gaussian",
    "importance_ts",
    "resample_edges",
    "stratified_ts",
    "stratified_ts_spaced",
    "composite",
    "composite_intervals",
]
