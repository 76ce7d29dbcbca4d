"""tiny_nerf_data.npz loader.

The reference's download_data.sh fetches this file (download_data.sh:4)
but the reference codebase never actually loads it — its notebook cells
reference only the Blender dirs. We support it anyway so every artifact
the reference points users at is usable: the npz carries ``images``
(N, H, W, 3) float32, ``poses`` (N, 4, 4), and scalar ``focal``.

Split convention (the original tiny-NeRF colab): images [0, 100) train,
the remainder held out (split evenly val/test here).
"""

from __future__ import annotations

import numpy as np

from nerf_simple_tpu.data.blender import BlenderData, BlenderSplit


def load_tiny_nerf(path: str, n_train: int = 100) -> BlenderData:
    data = np.load(path)
    images = np.asarray(data["images"], np.float32)
    poses = np.asarray(data["poses"], np.float32)
    focal = float(data["focal"])
    n = len(images)
    n_train = min(n_train, n - 2)
    held = n - n_train
    n_val = held // 2

    def split(lo, hi):
        return BlenderSplit(images=images[lo:hi], poses=poses[lo:hi])

    return BlenderData(
        splits={
            "train": split(0, n_train),
            "val": split(n_train, n_train + n_val),
            "test": split(n_train + n_val, n),
        },
        H=images.shape[1],
        W=images.shape[2],
        f=focal,
    )
