"""Blender-synthetic (nerf_synthetic) dataset loader.

Behavior-equivalent to reference utils/dataload.py:12-112:

- images listed per split and natural-sorted (train/val: every file in the
  split dir; test: only ``r_<n>.png``, with depth/normal maps listed
  separately — utils/dataload.py:36-46);
- cv2 BGR->RGB then /255; the alpha channel is DROPPED (cv2.imread default),
  so no white-background compositing — unlike original NeRF
  (utils/dataload.py:66);
- ``half_res`` downsamples W//2 x H//2 with INTER_AREA (utils/dataload.py:69-71);
- ``num_imgs >= 0`` truncates ALL THREE splits to that count
  (utils/dataload.py:55-61);
- focal length ``f = W / (2 tan(camera_angle_x / 2))`` computed from the
  (possibly halved) image size (utils/dataload.py:101-105).

Host-side numpy only; arrays go to device once, in bulk, via
data/dataset.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re

import numpy as np


def _natural_key(s: str):
    """Case-insensitive natural sort key (replacement for the reference's
    natsort dependency, utils/dataload.py:34)."""
    return [
        int(tok) if tok.isdigit() else tok.lower()
        for tok in re.split(r"(\d+)", os.path.basename(s))
    ]


def _imread_rgb(path: str, white_bkgd: bool = False) -> np.ndarray:
    import cv2

    if white_bkgd:
        # original-NeRF behavior: composite RGBA onto white. The reference
        # cannot do this (cv2.imread default drops alpha,
        # utils/dataload.py:66) — opt-in extension.
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.shape[-1] == 4:
            rgb = cv2.cvtColor(img[..., :3], cv2.COLOR_BGR2RGB) / 255.0
            a = img[..., 3:4] / 255.0
            return rgb * a + (1.0 - a)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0
    img = cv2.imread(path)  # drops alpha, matching the reference
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0


def _half(img: np.ndarray) -> np.ndarray:
    import cv2

    H, W = img.shape[:2]
    return cv2.resize(img, (W // 2, H // 2), interpolation=cv2.INTER_AREA)


@dataclasses.dataclass
class BlenderSplit:
    """One split: stacked images + camera-to-world poses."""

    images: np.ndarray  # (N, H, W, 3) float32 in [0, 1]
    poses: np.ndarray  # (N, 4, 4) float32
    # test split extras (reference utils/dataload.py:87-99); None elsewhere
    depth_images: np.ndarray | None = None
    normal_images: np.ndarray | None = None
    # metric GT depth from the <scene>/depth/<split>/r_<i>.npy sidecars
    # (written by data/synthetic.py write_depth=True); (N, H, W) float32
    # expected termination distance, or None when the sidecar dir is
    # absent. Unlike depth_images (the reference's 8-bit visualization
    # PNGs), this is supervisable — see TrainConfig.depth_loss_weight.
    metric_depth: np.ndarray | None = None

    def __len__(self) -> int:
        return len(self.images)


@dataclasses.dataclass
class BlenderData:
    splits: dict[str, BlenderSplit]
    H: int
    W: int
    f: float
    # set by the LLFF loader (data/llff.py); Blender scenes keep defaults
    ndc: bool = False
    near: float = 2.0
    far: float = 6.0

    @property
    def cam_params(self) -> list:
        return [self.H, self.W, self.f]


def load_blender(
    path: str,
    half_res: bool = True,
    num_imgs: int = -1,
    load_test_maps: bool = False,
    white_bkgd: bool = False,
) -> BlenderData:
    """Load a nerf_synthetic-format scene directory.

    Args:
      path: scene dir containing train/ val/ test/ and transforms_*.json.
      half_res: downsample images 2x (INTER_AREA).
      num_imgs: if >= 0, truncate every split to this many images
        (reference semantics, utils/dataload.py:55-61).
      load_test_maps: also load test-split depth/normal maps (the reference
        loads them unconditionally at full res; here opt-in since they are
        unused by training/eval).
      white_bkgd: composite RGBA onto white (original-NeRF convention; the
        reference drops alpha and cannot — opt-in extension).
    """
    transforms = {}
    for split in ("train", "val", "test"):
        with open(os.path.join(path, f"transforms_{split}.json")) as fh:
            transforms[split] = json.load(fh)

    splits: dict[str, BlenderSplit] = {}
    H = W = 0
    for split in ("train", "val", "test"):
        split_dir = os.path.join(path, split)
        if split == "test":
            img_paths = [
                os.path.join(split_dir, fn)
                for fn in os.listdir(split_dir)
                if re.match(r"r_[0-9]+.png", fn)
            ]
        else:
            img_paths = [
                os.path.join(split_dir, fn) for fn in os.listdir(split_dir)
            ]
        img_paths.sort(key=_natural_key)

        # num_imgs truncates every split (reference utils/dataload.py:55-61);
        # clamped to what exists (the reference would IndexError on splits
        # smaller than num_imgs — lego has >=100 everywhere so it never hit)
        n = len(img_paths) if num_imgs < 0 else min(num_imgs, len(img_paths))
        imgs, poses = [], []
        for i in range(n):
            img = _imread_rgb(img_paths[i], white_bkgd)
            if half_res:
                img = _half(img)
            imgs.append(img.astype(np.float32))
            poses.append(
                np.asarray(
                    transforms[split]["frames"][i]["transform_matrix"],
                    np.float32,
                )
            )

        depth = normal = None
        if split == "test" and load_test_maps:
            dpaths = sorted(
                (
                    os.path.join(split_dir, fn)
                    for fn in os.listdir(split_dir)
                    if re.match(r"r_[0-9]+_depth", fn)
                ),
                key=_natural_key,
            )
            npaths = sorted(
                (
                    os.path.join(split_dir, fn)
                    for fn in os.listdir(split_dir)
                    if re.match(r"r_[0-9]+_normal", fn)
                ),
                key=_natural_key,
            )
            if dpaths:
                depth = np.stack(
                    [_imread_rgb(p).astype(np.float32) for p in dpaths[:n]]
                )
            if npaths:
                normal = np.stack(
                    [_imread_rgb(p).astype(np.float32) for p in npaths[:n]]
                )

        # metric depth sidecars: <path>/depth/<split>/r_<i>.npy, one per
        # kept image (all-or-nothing — a partial set is ignored with a
        # warning rather than silently mis-aligning rows)
        metric = None
        ddir = os.path.join(path, "depth", split)
        if os.path.isdir(ddir):
            dpaths_m = [os.path.join(ddir, f"r_{i}.npy") for i in range(n)]
            if all(os.path.exists(p) for p in dpaths_m):
                maps = [np.load(p).astype(np.float32) for p in dpaths_m]
                if half_res:
                    # area-average metric depth alongside the images
                    maps = [_half(m) for m in maps]
                metric = np.stack(maps)
            else:
                import warnings

                warnings.warn(
                    f"{ddir} exists but is missing some of r_0..r_{n - 1}"
                    ".npy; ignoring metric depth for this split",
                    stacklevel=2,
                )

        splits[split] = BlenderSplit(
            images=np.stack(imgs),
            poses=np.stack(poses),
            depth_images=depth,
            normal_images=normal,
            metric_depth=metric,
        )
        H, W = imgs[-1].shape[:2]

    fov = transforms["train"]["camera_angle_x"]
    f = W / (2.0 * np.tan(fov / 2.0))
    return BlenderData(splits=splits, H=H, W=W, f=float(f))
