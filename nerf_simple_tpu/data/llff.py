"""LLFF (forward-facing real scene) loader with NDC support.

A roadmap item of the reference (README.md:53 "LLFF data loading ...");
no reference implementation exists, so this follows the standard LLFF
conventions (poses_bounds.npy as produced by the LLFF imgs2poses tool):

- ``poses_bounds.npy``: (N, 17) rows = 3x5 pose ([R | t | (H, W, f)^T])
  + (near, far) depth bounds;
- pose columns arrive as [down, right, back] and are converted to the
  NeRF [right, up, back] convention;
- scenes are rescaled so the nearest depth bound maps to ~4/3 (bd_factor
  0.75) and poses are recentered about their average;
- every ``llffhold``-th image becomes the test/val split (standard
  practice: val == test for LLFF), the rest train;
- with ``ndc=True`` the ray warp (ops.rays.ndc_rays) runs at dataset
  build time and sampling spans t in [0, 1].

Returns the same ``BlenderData`` container the Blender loader produces, so
the whole downstream pipeline (RayDataset, train/eval drivers) is shared.
"""

from __future__ import annotations

import os

import numpy as np

from nerf_simple_tpu.data.blender import BlenderData, BlenderSplit, _natural_key
from nerf_simple_tpu.ops.rays import view_matrix


def _recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Transform all poses so the average pose is the identity."""
    center = poses[:, :3, 3].mean(0)
    z = poses[:, :3, 2].sum(0)
    up = poses[:, :3, 1].sum(0)
    c2w = np.concatenate(
        [view_matrix(z, up, center), np.array([[0, 0, 0, 1.0]])], axis=0
    )
    return np.linalg.inv(c2w) @ poses


def load_llff(
    path: str,
    factor: int = 8,
    ndc: bool = True,
    llffhold: int = 8,
    bd_factor: float = 0.75,
) -> BlenderData:
    """Load an LLFF scene directory (images/ + poses_bounds.npy).

    A raw COLMAP reconstruction (images/ + sparse/0/) works too: when
    ``poses_bounds.npy`` is absent it is built from the COLMAP model
    first (data/colmap.py — the reference's "Integrate ColMap" roadmap
    item, reference README.md:55).
    """
    import cv2

    pb_path = os.path.join(path, "poses_bounds.npy")
    if not os.path.exists(pb_path):
        from nerf_simple_tpu.data.colmap import ensure_poses_bounds

        ensure_poses_bounds(path)
    pb = np.load(pb_path)  # (N, 17)
    poses_raw = pb[:, :15].reshape(-1, 3, 5)
    bounds = pb[:, 15:]  # (N, 2)

    # [down, right, back] -> [right, up, back]
    poses3x4 = np.concatenate(
        [poses_raw[:, :, 1:2], -poses_raw[:, :, 0:1], poses_raw[:, :, 2:4]],
        axis=2,
    )  # (N, 3, 4)
    hwf = poses_raw[0, :, 4]  # (3,) H, W, f at original resolution

    img_dir = os.path.join(path, f"images_{factor}" if factor > 1 else "images")
    pre_scaled = os.path.isdir(img_dir)
    if not pre_scaled:
        img_dir = os.path.join(path, "images")
    names = [
        n
        for n in os.listdir(img_dir)
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    ]
    names.sort(key=_natural_key)
    assert len(names) == len(poses3x4), (
        f"{len(names)} images vs {len(poses3x4)} poses"
    )

    imgs = []
    for n in names:
        img = cv2.imread(os.path.join(img_dir, n))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0
        if not pre_scaled and factor > 1:
            h, w = img.shape[:2]
            img = cv2.resize(
                img, (w // factor, h // factor), interpolation=cv2.INTER_AREA
            )
        imgs.append(img.astype(np.float32))
    imgs = np.stack(imgs)
    H, W = imgs.shape[1:3]
    f = float(hwf[2]) * (W / hwf[1])  # scale focal with actual width

    # rescale world so min bound ~ 1/bd_factor, then recenter
    scale = 1.0 / (bounds.min() * bd_factor)
    poses = np.tile(np.eye(4, dtype=np.float64), (len(poses3x4), 1, 1))
    poses[:, :3, :4] = poses3x4
    poses[:, :3, 3] *= scale
    bounds = bounds * scale
    poses = _recenter_poses(poses).astype(np.float32)

    i_test = np.arange(len(imgs))[::llffhold]
    i_train = np.array([i for i in range(len(imgs)) if i not in set(i_test)])

    def split(idx):
        return BlenderSplit(images=imgs[idx], poses=poses[idx])

    data = BlenderData(
        splits={
            "train": split(i_train),
            "val": split(i_test),
            "test": split(i_test),
        },
        H=H,
        W=W,
        f=f,
    )
    # NDC metadata consumed by RayDataset.from_blender
    data.ndc = ndc
    data.near = float(bounds.min()) if not ndc else 1.0
    data.far = float(bounds.max())
    # world-space depth bounds regardless of NDC (spiral-path focus depth)
    data.world_near = float(bounds.min())
    data.world_far = float(bounds.max())
    return data
