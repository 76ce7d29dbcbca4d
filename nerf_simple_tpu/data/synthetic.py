"""Procedural synthetic scene: an analytic emission-absorption field plus
ground-truth renders, used by tests, benchmarks, and demos.

This environment has no downloaded nerf_synthetic data (zero egress), so
the framework ships a self-contained analytic scene: a cluster of colored
Gaussian density blobs near the origin, viewed from the reference's
standard orbit (r=4, theta=-30, the test.py:33 defaults). GT images are
rendered with the SAME compositing math the model trains against (dense
midpoint sampling), so the scene is exactly representable and end-to-end
training tests converge fast.

``write_blender_scene`` serializes the scene in nerf_synthetic layout
(train/ val/ test/ + transforms_*.json with ``camera_angle_x``), so the
Blender loader (data/blender.py) is exercised by the same fixture.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.ops.rays import rays_for_poses, spherical_to_pose
from nerf_simple_tpu.ops.volume import composite

# (center xyz, pre-softplus peak sigma, rgb color, radius)
_BLOBS = (
    ((0.0, 0.0, 0.0), 8.0, (0.9, 0.2, 0.1), 0.45),
    ((0.6, 0.3, -0.2), 6.0, (0.1, 0.8, 0.2), 0.35),
    ((-0.5, -0.4, 0.3), 6.0, (0.2, 0.3, 0.9), 0.40),
    ((0.1, -0.6, -0.4), 5.0, (0.9, 0.8, 0.1), 0.30),
)

# Hard-surface "machine" scene: sharp-edged boxes (near-binary density)
# occupying ~2% of the [-2, 2]^3 volume — the canonical-lego regime
# (opaque surfaces, large empty margins) that the smooth blob cluster
# cannot emulate. (center, half-extents, color)
_HARD_PARTS = (
    ((0.0, 0.0, -0.55), (0.90, 0.60, 0.10), (0.80, 0.72, 0.20)),  # base
    ((0.0, 0.0, -0.25), (0.55, 0.45, 0.20), (0.85, 0.12, 0.10)),  # body
    ((-0.15, 0.0, 0.10), (0.30, 0.30, 0.15), (0.90, 0.85, 0.30)),  # cab
    ((0.55, 0.0, -0.05), (0.12, 0.12, 0.45), (0.40, 0.40, 0.45)),  # mast
    ((0.80, 0.0, 0.32), (0.35, 0.10, 0.08), (0.30, 0.30, 0.35)),  # arm
    ((-0.45, 0.45, -0.62), (0.15, 0.08, 0.15), (0.10, 0.10, 0.12)),
    ((0.35, 0.45, -0.62), (0.15, 0.08, 0.15), (0.10, 0.10, 0.12)),
    ((-0.45, -0.45, -0.62), (0.15, 0.08, 0.15), (0.10, 0.10, 0.12)),
    ((0.35, -0.45, -0.62), (0.15, 0.08, 0.15), (0.10, 0.10, 0.12)),
)


def _field_blobs(locs: jnp.ndarray) -> jnp.ndarray:
    sigma = jnp.full(locs.shape[:-1], -10.0, locs.dtype)
    rgb_acc = jnp.zeros((*locs.shape[:-1], 3), locs.dtype)
    w_acc = jnp.zeros(locs.shape[:-1], locs.dtype)
    for (cx, cy, cz), peak, color, radius in _BLOBS:
        d2 = jnp.sum((locs - jnp.asarray([cx, cy, cz], locs.dtype)) ** 2, -1)
        g = jnp.exp(-d2 / (2.0 * radius**2))
        sigma = sigma + peak * g
        rgb_acc = rgb_acc + g[..., None] * jnp.asarray(color, locs.dtype)
        w_acc = w_acc + g
    rgb = rgb_acc / jnp.maximum(w_acc[..., None], 1e-6)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def _field_hard(locs: jnp.ndarray) -> jnp.ndarray:
    """Near-binary box densities: sigma transitions over ~0.07 world
    units (sigmoid sharpness 30) to a pre-softplus peak of 40 — one
    sample inside the wall saturates alpha, like an opaque surface."""
    SHARP, PEAK = 30.0, 40.0
    sigma = jnp.full(locs.shape[:-1], -10.0, locs.dtype)
    rgb_acc = jnp.zeros((*locs.shape[:-1], 3), locs.dtype)
    w_acc = jnp.zeros(locs.shape[:-1], locs.dtype)
    for center, half, color in _HARD_PARTS:
        q = jnp.max(
            jnp.abs(locs - jnp.asarray(center, locs.dtype))
            / jnp.asarray(half, locs.dtype),
            axis=-1,
        )
        m = jax.nn.sigmoid(SHARP * (1.0 - q))
        sigma = sigma + PEAK * m
        rgb_acc = rgb_acc + m[..., None] * jnp.asarray(color, locs.dtype)
        w_acc = w_acc + m
    rgb = rgb_acc / jnp.maximum(w_acc[..., None], 1e-6)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def _field_unbounded(locs: jnp.ndarray) -> jnp.ndarray:
    """Two depth octaves: the central blob cluster (radius ~1-2) plus a
    distant shell at radius 20 painted with azimuth/elevation color
    bands — the regime scene contraction + disparity sampling exist
    for. Cameras at r=4 see the shell through every pixel that misses
    the center, so a bounded model (tf=6) renders those pixels black
    and a linear sampler wastes its budget on 18 units of empty space.
    The supports are spatially disjoint, so the blend is a simple
    density-argmax."""
    near = _field_blobs(locs)
    r = jnp.linalg.norm(locs, axis=-1)
    m = jax.nn.sigmoid(8.0 * (0.75 - jnp.abs(r - 20.0)))
    shell_sigma = -10.0 + 30.0 * m
    az = jnp.arctan2(locs[..., 1], locs[..., 0])
    # 6-cycle bands: azimuthal wavelength ~21 units at the shell, so a
    # model that paints the background on a camera-centered far plane
    # (instead of representing the shell's world-space depth) misprojects
    # by whole color bands once cameras vary in radius
    bands = 0.5 + 0.5 * jnp.sin(6.0 * az)
    el = locs[..., 2] / jnp.maximum(r, 1e-6)
    shell_rgb = jnp.stack(
        [bands, 1.0 - bands, 0.5 + 0.5 * el], axis=-1
    )
    take_shell = (shell_sigma > near[..., 3])[..., None]
    sigma = jnp.maximum(near[..., 3], shell_sigma)
    rgb = jnp.where(take_shell, shell_rgb, near[..., :3])
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


_STYLES = {
    "blobs": _field_blobs,
    "hard": _field_hard,
    "unbounded": _field_unbounded,
}


def field(locs: jnp.ndarray, style: str = "blobs") -> jnp.ndarray:
    """Analytic radiance field: (..., 3) positions -> (..., 4) rgb+sigma
    (sigma is pre-softplus, matching the raw MLP output convention).

    ``style``: "blobs" (smooth Gaussian cluster — the fast-converging
    test fixture) or "hard" (sharp-edged low-occupancy machine — the
    canonical-lego regime for occupancy/hierarchical/hashgrid benches).
    """
    return _STYLES[style](locs)


def orbit_cameras(
    n: int,
    r: float = 4.0,
    theta_deg: float = -30.0,
    seed_jitter: int = 0,
    r_range: tuple[float, float] | None = None,
) -> np.ndarray:
    """(n, 4, 4) poses spread over azimuth [0, 360), with optional
    deterministic elevation jitter for split diversity.

    ``r_range``: draw each camera's radius uniformly from (lo, hi)
    instead of the fixed ``r``. Radius variance gives the BACKGROUND
    parallax that separates a world-space far field from a
    camera-centered one — on a constant-radius rig, painting the distant
    shell onto each camera's far plane is nearly view-consistent (the
    1e10 tail delta lets a bounded model do exactly that), so
    unbounded-scene fixtures need this on."""
    rng = np.random.default_rng(seed_jitter)
    phis = np.linspace(0.0, 360.0, n, endpoint=False)
    thetas = theta_deg + (
        rng.uniform(-8, 8, n) if seed_jitter else np.zeros(n)
    )
    rs = rng.uniform(*r_range, n) if r_range else np.full(n, r)
    return np.stack(
        [spherical_to_pose(rr, t, p) for rr, t, p in zip(rs, thetas, phis)]
    ).astype(np.float32)


def render_gt(
    poses: np.ndarray,
    H: int,
    W: int,
    f: float,
    N: int = 192,
    tn: float = 2.0,
    tf: float = 6.0,
    style: str = "blobs",
    return_depth: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Ground-truth images via dense midpoint sampling of the analytic
    field, composited with ops.volume.composite. Returns (P, H, W, 3) in
    [0, 1] float32 (clipped like eval renders); with ``return_depth``
    also the (P, H, W) expected termination depth (sum of w*t — the same
    quantity a trained model's composite predicts, so depth supervision
    targets are exactly representable)."""

    @jax.jit
    def render_one(pose):
        rays = rays_for_poses(pose[None], H, W, f)
        mids = tn + (jnp.arange(N, dtype=jnp.float32) + 0.5) * (tf - tn) / N
        ts = jnp.broadcast_to(mids, (H * W, N))
        origins, dirs = rays[:, :3], rays[:, 3:]
        locs = origins[:, None, :] + dirs[:, None, :] * ts[..., None]
        unit = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = field(locs, style)
        comp = composite(out, ts, unit)
        return (
            jnp.clip(comp.rgb, 0.0, 1.0).reshape(H, W, 3),
            comp.depth.reshape(H, W),
        )

    outs = [render_one(jnp.asarray(p)) for p in poses]
    imgs = np.stack([np.asarray(o[0]) for o in outs]).astype(np.float32)
    if not return_depth:
        return imgs
    depths = np.stack([np.asarray(o[1]) for o in outs]).astype(np.float32)
    return imgs, depths


def write_blender_scene(
    path: str,
    n_train: int = 8,
    n_val: int = 2,
    n_test: int = 2,
    H: int = 64,
    W: int = 64,
    fov_x: float = 0.6911112070083618,  # lego's camera_angle_x
    train_jitter: int = 0,
    style: str = "blobs",
    write_depth: bool = False,
    camera_r_range: tuple[float, float] | None = None,
) -> None:
    """Write the synthetic scene to ``path`` in nerf_synthetic layout.

    ``train_jitter``: elevation-jitter seed for the TRAIN cameras. The
    default 0 keeps the historical fixture (all train views at exactly
    theta=-30 — a degenerate 1D view circle that MLP smoothness forgives
    but grid-capacity models exploit: measured 26 dB test / 40 dB train
    for the hashgrid family on it, vs 33/33 with jittered elevations).
    Set a nonzero seed for a fair novel-view-generalization fixture.

    ``style``: "blobs" (smooth, fast-converging) or "hard" (sharp-edged
    ~2%-occupancy machine; GT is sampled at 3x density to resolve the
    near-binary walls).

    ``write_depth``: also save metric GT depth (expected termination
    distance) per image as ``<path>/depth/<split>/r_<i>.npy`` — a
    SIDECAR dir, deliberately outside the split dirs the Blender loader
    globs (train/val list every file, data/blender.py:134-136).
    Consumed by depth-supervised training (TrainConfig.depth_loss_weight)
    and eval depth metrics. The reference parses test-split depth PNGs
    (utils/dataload.py:87-99) but nothing consumes them; these are the
    metric counterpart that something does.
    """
    import cv2

    f = W / (2.0 * np.tan(fov_x / 2.0))
    gt_N = 576 if style in ("hard", "unbounded") else 192
    # the unbounded shell sits at radius 20: GT must integrate past it
    # (from a radius-6 camera the shell's far side is ~26.75 away), and
    # varied-radius rigs put cameras as close as ~1 unit from the cluster
    gt_tn = 0.5 if style == "unbounded" else 2.0
    gt_tf = 30.0 if style == "unbounded" else 6.0
    specs = {
        "train": orbit_cameras(
            n_train, seed_jitter=train_jitter, r_range=camera_r_range
        ),
        "val": orbit_cameras(n_val, seed_jitter=1, r_range=camera_r_range),
        "test": orbit_cameras(n_test, seed_jitter=2, r_range=camera_r_range),
    }
    for split, poses in specs.items():
        split_dir = os.path.join(path, split)
        os.makedirs(split_dir, exist_ok=True)
        imgs, depths = render_gt(
            poses, H, W, f, N=gt_N, tn=gt_tn, tf=gt_tf, style=style,
            return_depth=True,
        )
        if write_depth:
            ddir = os.path.join(path, "depth", split)
            os.makedirs(ddir, exist_ok=True)
            for i, d in enumerate(depths):
                np.save(os.path.join(ddir, f"r_{i}.npy"), d)
        frames = []
        for i, (img, pose) in enumerate(zip(imgs, poses)):
            fname = f"r_{i}.png"
            cv2.imwrite(
                os.path.join(split_dir, fname),
                cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
            frames.append(
                {
                    "file_path": f"./{split}/r_{i}",
                    "transform_matrix": pose.tolist(),
                }
            )
        with open(os.path.join(path, f"transforms_{split}.json"), "w") as fh:
            json.dump({"camera_angle_x": fov_x, "frames": frames}, fh)
