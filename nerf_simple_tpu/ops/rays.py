"""Camera ray generation and spherical pose synthesis.

Behavior-equivalent to reference utils/xyz.py:38-91 and the ray-dataset
precompute at utils/dataload.py:114-129 / utils/rendering.py:129-134, but
expressed as batched jnp einsums that XLA maps straight onto the MXU, so
the whole-dataset ray precompute runs on device in one fused program.

Conventions (reference utils/xyz.py:38-52):
- pixel (row r, col c) maps to the camera-frame direction
  ``((c - W//2)/f, -(r - H//2)/f, -1)`` — integer-centered grid, NOT the
  half-pixel-centered grid of the original NeRF codebase;
- rays are returned row-major over the image (all of row 0, then row 1, …);
- directions are NOT normalized here (sampling uses the unnormalized
  direction, see ops/sampling.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def camera_ray_dirs(H: int, W: int, f: float, dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel ray directions in the camera frame.

    Returns:
      (H*W, 3) array, row-major over pixels, matching the reference layout
      (utils/xyz.py:48-51 builds 3xHW; we use the transposed HWx3 layout
      because rows-of-rays is the natural lane layout on TPU).
    """
    rows = jnp.arange(H, dtype=dtype) - H // 2
    cols = jnp.arange(W, dtype=dtype) - W // 2
    x = jnp.broadcast_to(cols[None, :] / f, (H, W))
    y = jnp.broadcast_to(-rows[:, None] / f, (H, W))
    z = -jnp.ones((H, W), dtype=dtype)
    return jnp.stack([x, y, z], axis=-1).reshape(H * W, 3)


def rays_for_poses(poses: jnp.ndarray, H: int, W: int, f: float) -> jnp.ndarray:
    """Build the packed ``[origin | direction]`` ray set for many cameras.

    The reference materializes this per split with a batched matmul on host
    (utils/dataload.py:114-129); here it is a single device einsum so the
    full training ray set is born resident in HBM.

    Args:
      poses: (P, 4, 4) camera-to-world matrices.
      H, W, f: camera intrinsics.

    Returns:
      (P * H * W, 6) rays, camera-major then row-major, matching the
      reference's ``BHW x 6`` flattening (utils/dataload.py:127).
    """
    cam_dirs = camera_ray_dirs(H, W, f, dtype=poses.dtype)  # (HW, 3)
    # world_dirs[p, n, :] = R_p @ cam_dirs[n]. Full f32 precision: ray
    # geometry feeds sample positions, where bf16 MXU rounding is visible.
    world_dirs = jnp.einsum(
        "pij,nj->pni",
        poses[:, :3, :3],
        cam_dirs,
        precision=jax.lax.Precision.HIGHEST,
    )
    origins = jnp.broadcast_to(poses[:, None, :3, 3], world_dirs.shape)
    return jnp.concatenate([origins, world_dirs], axis=-1).reshape(-1, 6)


def rays_for_poses_scaled(
    poses: jnp.ndarray, H: int, W: int, f: float, s: int
) -> jnp.ndarray:
    """Rays for a 1/s-scale render whose pixel centers ALIGN with the
    INTER_AREA block centers of the full-res integer-centered grid.

    ``rays_for_poses(poses, H//s, W//s, f/s)`` keeps the reference's
    integer-centered convention at the low resolution, which lands
    (s-1)/2 full-res pixels away from the center of the s x s block an
    area-downsample averages — a systematic half-block shear worth
    several dB at s >= 4. Here low-res pixel i samples full-res
    coordinate ``s*i + (s-1)/2``, the exact block center. Used by the
    multiscale mip training pyramid and the multi-scale benchmark.

    Returns (P * (H//s) * (W//s), 6), camera-major then row-major.
    """
    if s == 1:
        return rays_for_poses(poses, H, W, f)
    Hs, Ws = H // s, W // s
    dtype = poses.dtype
    rows = jnp.arange(Hs, dtype=dtype) * s + (s - 1) / 2.0 - H // 2
    cols = jnp.arange(Ws, dtype=dtype) * s + (s - 1) / 2.0 - W // 2
    x = jnp.broadcast_to(cols[None, :] / f, (Hs, Ws))
    y = jnp.broadcast_to(-rows[:, None] / f, (Hs, Ws))
    z = -jnp.ones((Hs, Ws), dtype=dtype)
    cam_dirs = jnp.stack([x, y, z], axis=-1).reshape(Hs * Ws, 3)
    world_dirs = jnp.einsum(
        "pij,nj->pni",
        poses[:, :3, :3],
        cam_dirs,
        precision=jax.lax.Precision.HIGHEST,
    )
    origins = jnp.broadcast_to(poses[:, None, :3, 3], world_dirs.shape)
    return jnp.concatenate([origins, world_dirs], axis=-1).reshape(-1, 6)


def mip_ray_radii(
    rays: jnp.ndarray, H: int, W: int, use_origins: bool
) -> jnp.ndarray:
    """Per-ray mip radii from neighboring-pixel spacing (the mip-NeRF
    datasets.py convention): the distance between pixel i and its
    x-neighbor's ray, times 2/sqrt(12) (the base of an isoceles triangle
    matching a unit-width pixel's variance).

    For NDC-warped rays pixel offsets live in the ORIGINS (rays start on
    the near plane; use_origins=True, paired with cylinder moments); for
    unwarped rays they live in the DIRECTIONS (use_origins=False, cone
    moments). For an ideal pinhole grid the direction spacing is exactly
    1/f everywhere, recovering the Blender drivers' scalar
    ``2/sqrt(12)/f``.

    Args: rays (P*H*W, >=6) camera-major row-major. Returns (P*H*W,).
    """
    P = rays.shape[0] // (H * W)
    v = rays[:, :3] if use_origins else rays[:, 3:6]
    g = v.reshape(P, H, W, 3)
    dx = jnp.sqrt(
        jnp.sum((g[:, :, :-1, :] - g[:, :, 1:, :]) ** 2, axis=-1)
    )  # (P, H, W-1)
    dx = jnp.concatenate([dx, dx[:, :, -1:]], axis=2)
    return (dx * (2.0 / jnp.sqrt(12.0))).reshape(-1)


def append_mip_ray_columns(
    rays: jnp.ndarray, H: int, W: int, use_origins: bool
) -> jnp.ndarray:
    """Extend (N, 6) rays to the mip paths' 8-column protocol
    ``[origin | direction | radius | loss_weight]`` with neighbor-spacing
    radii (``mip_ray_radii``) and unit loss weights. The ONE place the
    column convention is encoded for the LLFF/eval/animation callers
    (multiscale training builds its own weights in
    data/dataset.py::multiscale_train_arrays)."""
    radii = mip_ray_radii(rays, H, W, use_origins)
    return jnp.concatenate(
        [rays, radii[:, None], jnp.ones((rays.shape[0], 1), rays.dtype)],
        axis=-1,
    )


def ndc_rays(
    rays: jnp.ndarray, H: int, W: int, f: float, near: float = 1.0
) -> jnp.ndarray:
    """Warp packed ``[origin | direction]`` rays to NDC space (NeRF paper
    appendix C) for forward-facing LLFF scenes.

    No reference implementation exists (LLFF/NDC is a roadmap item,
    reference README.md:53); this is the standard projective warp: shift
    each origin to the near plane (z = -near), then map the view frustum
    to the [-1,1]^2 x [0,1] cube so t in [0, 1] spans near..infinity.
    """
    o, d = rays[:, :3], rays[:, 3:]
    # shift origins onto the near plane
    t = -(near + o[:, 2]) / d[:, 2]
    o = o + t[:, None] * d

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    o0 = -f / (W / 2.0) * ox / oz
    o1 = -f / (H / 2.0) * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = -f / (W / 2.0) * (dx / dz - ox / oz)
    d1 = -f / (H / 2.0) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz
    return jnp.stack([o0, o1, o2, d0, d1, d2], axis=-1)


# --- Camera-pose refinement (BARF-style joint pose optimization).
# No reference analogue (the reference trusts dataset poses); these are
# the differentiable se(3)-delta ops the train step applies to sampled
# rays so the photometric loss can correct miscalibrated real-capture
# poses (train/step.py, cfg.pose_opt).


def rodrigues_rotate(rvec: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` (..., 3) by axis-angle ``rvec`` (..., 3).

    Rodrigues' formula written with the two even coefficients
    ``sin(t)/t`` and ``(1 - cos t)/t^2 == 2 sin^2(t/2)/t^2`` so it is
    exact, smooth, and autodiff-safe at the zero rotation (the training
    init): near zero both switch to their series, and the exact branches
    use the half-angle form plus a clamp that keeps every VJP
    intermediate in f32's NORMAL range — a naive ``(1-cos t)/max(t^2,
    1e-24)`` is value-safe but its VJP squares the denominator (1e-48
    underflows to 0) and emits 0/0 at the zero delta.
    """
    sq = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    th = jnp.sqrt(jnp.maximum(sq, 1e-24))
    small = sq < 1e-8
    sinc = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(th) / th)
    half = jnp.sin(0.5 * th) / th  # -> 1/2 as th -> 0, no cancellation
    cosc = jnp.where(small, 0.5 - sq / 24.0, 2.0 * half * half)
    cr = jnp.cross(rvec, v)
    crr = jnp.cross(rvec, cr)
    return v + sinc * cr + cosc * crr


def apply_cam_deltas(
    rays: jnp.ndarray, dr: jnp.ndarray, dt: jnp.ndarray
) -> jnp.ndarray:
    """Refine packed ``[origin | direction | ...]`` rays by per-ray pose
    deltas: directions rotate by ``rodrigues_rotate(dr, .)`` (a rotation
    about the camera center — total rotation R(dr) @ R0), origins
    translate by ``dt`` (world frame). Both (B, 3), gathered per ray
    from the per-image delta tables. Columns past 6 (mip radius/weight)
    pass through untouched; at the zero delta this is the identity."""
    o, d = rays[:, :3], rays[:, 3:6]
    return jnp.concatenate(
        [o + dt, rodrigues_rotate(dr, d), rays[:, 6:]], axis=-1
    )


def bake_cam_deltas(
    rays: jnp.ndarray,
    dr_tbl: jnp.ndarray,
    dt_tbl: jnp.ndarray,
    rays_per_image: int,
) -> jnp.ndarray:
    """Apply per-IMAGE pose deltas to a whole packed ray dataset in one
    pass: row i belongs to image ``i // rays_per_image`` (the row-major
    [image, pixel] layout of ``rays_for_poses``). Used when pose
    refinement freezes (TrainConfig.pose_freeze_at): after baking, the
    dataset itself carries the refinement and the per-step
    ``apply_cam_deltas`` (and its gradient traffic) disappears from the
    train step. Equal to the per-ray form by construction — pinned in
    tests/test_pose_app.py."""
    im = jnp.arange(rays.shape[0]) // rays_per_image
    return apply_cam_deltas(rays, dr_tbl[im], dt_tbl[im])


# --- Spherical ("dome orbit") pose synthesis: reference utils/xyz.py:55-91.
# Host-side numpy: poses are tiny, built once per render job.


def _theta_mat(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array(
        [[1.0, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1.0]]
    )


def _phi_mat(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[c, s, 0, 0], [-s, c, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    )


def spherical_to_pose(r: float, theta_deg: float, phi_deg: float) -> np.ndarray:
    """4x4 camera-to-world pose at spherical coords (reference utils/xyz.py:70-81).

    Composition is ``phi_mat @ theta_mat @ translate(z=r)`` with the
    reference's exact rotation-sign conventions.
    """
    theta = np.radians(theta_deg)
    phi = np.radians(phi_deg)
    trans = np.eye(4)
    trans[2, 3] = r
    return _phi_mat(phi) @ _theta_mat(theta) @ trans


def orbit_poses(r: float, theta_deg: float, n_phi: int = 40) -> np.ndarray:
    """(n_phi, 4, 4) poses sweeping phi over [0, 360] inclusive
    (reference ``poses_to_render``, utils/xyz.py:83-91 — note the endpoint
    is included, so first and last frames coincide)."""
    phis = np.linspace(0.0, 360.0, n_phi)
    return np.stack([spherical_to_pose(r, theta_deg, p) for p in phis])


def view_matrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Camera-to-world 3x4 from a view direction, up hint and position
    ([right | up | back | pos] columns, NeRF convention)."""
    vec2 = z / np.linalg.norm(z)
    vec0 = np.cross(up, vec2)
    vec0 = vec0 / np.linalg.norm(vec0)
    vec1 = np.cross(vec2, vec0)
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def spiral_poses(
    poses: np.ndarray,
    near: float,
    far: float,
    n_poses: int = 120,
    n_rots: int = 2,
    zrate: float = 0.5,
    rad_percentile: float = 90.0,
    focus_weight: float = 0.75,
) -> np.ndarray:
    """Forward-facing spiral camera path for LLFF scenes.

    The reference's only animation is the spherical dome orbit
    (utils/xyz.py:83-91), which is geometrically wrong for forward-facing
    captures — the orbit leaves the narrow pose cone the scene was shot
    from. This is the standard LLFF spiral: cameras sweep an ellipse
    around the average pose (radii = ``rad_percentile`` of the training
    camera offsets) with a gentle z oscillation, all looking at a common
    focus point at the harmonic-weighted depth between near and far.

    Args:
      poses: (P, 4, 4) or (P, 3, 4) c2w training poses (recentered, as
        produced by data/llff.py — the average pose is ~identity).
      near/far: scene depth bounds (post-rescale, i.e. ``data.near/far``).

    Returns (n_poses, 4, 4) c2w matrices.
    """
    poses = np.asarray(poses, np.float64)
    # average camera frame (the spiral's coordinate system)
    center = poses[:, :3, 3].mean(0)
    z_avg = poses[:, :3, 2].sum(0)
    up = poses[:, :3, 1].sum(0)
    c2w = view_matrix(z_avg, up, center)  # (3, 4)

    # focus depth: harmonic blend biased toward the far bound
    focal = 1.0 / ((1.0 - focus_weight) / near + focus_weight / far)
    rads = np.percentile(np.abs(poses[:, :3, 3] - center), rad_percentile, 0)

    out = []
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_poses, endpoint=False):
        offset = rads * np.array(
            [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate)]
        )
        pos = center + c2w[:3, :3] @ offset
        look = center + c2w[:3, :3] @ np.array([0.0, 0.0, -focal])
        z = pos - look  # camera +z points backward (away from the scene)
        m = np.eye(4)
        m[:3, :4] = view_matrix(z, up, pos)
        out.append(m)
    return np.stack(out).astype(np.float32)
