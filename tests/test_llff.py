import os

import numpy as np
import pytest

from nerf_simple_tpu.data.llff import load_llff
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.ops.rays import ndc_rays


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    """Synthetic LLFF scene: 16 forward-facing cameras at z~4 looking -z."""
    import cv2

    d = str(tmp_path_factory.mktemp("llff"))
    img_dir = os.path.join(d, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    n, H, W, f = 16, 48, 64, 80.0
    rows = []
    for i in range(n):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"img_{i:03d}.png"), img)
        # c2w in [right, up, back] with slight xy offsets
        t = np.array([0.1 * (i % 4), 0.1 * (i // 4), 4.0 + 0.05 * i])
        r_, u, b = np.eye(3)
        # store as LLFF raw convention [down, right, back]
        raw = np.stack([-u, r_, b, t], axis=1)  # (3, 4)
        hwf = np.array([[H], [W], [f]])
        rows.append(
            np.concatenate(
                [np.concatenate([raw, hwf], axis=1).reshape(-1), [2.0, 8.0]]
            )
        )
    np.save(os.path.join(d, "poses_bounds.npy"), np.stack(rows))
    return d


def test_llff_splits_and_focal(llff_dir):
    data = load_llff(llff_dir, factor=2, ndc=True)
    assert len(data.splits["test"]) == 2  # every 8th of 16
    assert len(data.splits["train"]) == 14
    assert len(data.splits["val"]) == 2
    assert data.H == 24 and data.W == 32
    # focal scales with the actual/origin width ratio
    assert np.isclose(data.f, 80.0 * (32 / 64), rtol=1e-6)
    assert data.ndc is True


def test_llff_recentering(llff_dir):
    data = load_llff(llff_dir, factor=1, ndc=False)
    all_poses = np.concatenate(
        [data.splits["train"].poses, data.splits["test"].poses]
    )
    # average camera position ~ origin after recentering
    assert np.abs(all_poses[:, :3, 3].mean(0)).max() < 0.5
    # rotations stay orthonormal
    for p in all_poses[:3]:
        np.testing.assert_allclose(
            p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5
        )


def test_ndc_warp_bounds():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    H, W, f = 24, 32, 40.0
    # rays from origin region looking -z (dz < 0)
    o = rng.uniform(-0.2, 0.2, (256, 3)) + [0, 0, 1.0]
    d = rng.normal(0, 0.2, (256, 3))
    d[:, 2] = -1.0
    rays = jnp.asarray(np.concatenate([o, d], -1), jnp.float32)
    out = np.asarray(ndc_rays(rays, H, W, f, near=1.0))
    assert np.isfinite(out).all()
    # origins lie on the near plane: o2' = 1 + 2/oz with oz <= -1
    assert (out[:, 2] <= 1.0 + 1e-5).all()
    # marching to t=1 lands at o2' + d2' = 1 (the far plane at infinity)
    np.testing.assert_allclose(out[:, 2] + out[:, 5], 1.0, atol=1e-5)


def test_llff_ray_dataset_ndc(llff_dir):
    data = load_llff(llff_dir, factor=2, ndc=True)
    rd = RayDataset.from_blender(data)
    r = np.asarray(rd.rays["train"])
    assert r.shape == (14 * 24 * 32, 6)
    assert np.isfinite(r).all()
    # NDC z-origin within the frustum cube
    assert (r[:, 2] <= 1.0 + 1e-4).all()
