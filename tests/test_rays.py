import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.ops.rays import (
    camera_ray_dirs,
    orbit_poses,
    rays_for_poses,
    spherical_to_pose,
)
from tests.oracle import camera_ray_dirs_np, spherical_to_pose_np


def test_camera_ray_dirs_tiny_hand_computed():
    # H=2, W=3, f=1: ray(r,c) = ((c-1)/1, -(r-1)/1, -1)
    d = np.asarray(camera_ray_dirs(2, 3, 1.0))
    expected = np.array(
        [
            [-1, 1, -1], [0, 1, -1], [1, 1, -1],   # row 0
            [-1, 0, -1], [0, 0, -1], [1, 0, -1],   # row 1
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(d, expected)


def test_camera_ray_dirs_matches_oracle():
    H, W, f = 7, 5, 3.2
    np.testing.assert_allclose(
        np.asarray(camera_ray_dirs(H, W, f)),
        camera_ray_dirs_np(H, W, f),
        atol=1e-6,
    )


def test_spherical_pose_matches_oracle():
    for r, th, ph in [(4.0, 30.0, 0.0), (2.5, -20.0, 135.0), (1.0, 90.0, 359.0)]:
        np.testing.assert_allclose(
            spherical_to_pose(r, th, ph), spherical_to_pose_np(r, th, ph), atol=1e-12
        )
    # camera sits at distance r from origin
    pose = spherical_to_pose(4.0, 30.0, 45.0)
    assert np.isclose(np.linalg.norm(pose[:3, 3]), 4.0)


def test_orbit_poses_endpoints_coincide():
    poses = orbit_poses(4.0, -30.0, n_phi=9)
    assert poses.shape == (9, 4, 4)
    np.testing.assert_allclose(poses[0], poses[-1], atol=1e-12)


def test_rays_for_poses_rotation_and_origin():
    H, W, f = 4, 4, 2.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    rays = np.asarray(rays_for_poses(jnp.asarray(pose)[None], H, W, f))
    assert rays.shape == (H * W, 6)
    np.testing.assert_allclose(rays[:, :3], np.tile([1, 2, 3], (H * W, 1)))
    np.testing.assert_allclose(rays[:, 3:], camera_ray_dirs_np(H, W, f), atol=1e-6)

    # a pure rotation rotates every direction by R
    pose2 = np.asarray(spherical_to_pose(3.0, 30.0, 60.0), dtype=np.float32)
    rays2 = np.asarray(rays_for_poses(jnp.asarray(pose2)[None], H, W, f))
    expected_dirs = camera_ray_dirs_np(H, W, f) @ pose2[:3, :3].T
    np.testing.assert_allclose(rays2[:, 3:], expected_dirs, atol=1e-5)
    np.testing.assert_allclose(rays2[:, :3], np.tile(pose2[:3, 3], (H * W, 1)), atol=1e-6)
