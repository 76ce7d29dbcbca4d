import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.data.blender import load_blender, _natural_key
from nerf_simple_tpu.data.dataset import RayDataset, sample_ray_batch
from nerf_simple_tpu.data.synthetic import write_blender_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    write_blender_scene(d, n_train=4, n_val=2, n_test=2, H=32, W=32)
    return d


def test_natural_sort_key():
    names = ["r_10.png", "r_2.png", "r_1.png", "R_3.png"]
    assert sorted(names, key=_natural_key) == [
        "r_1.png",
        "r_2.png",
        "R_3.png",
        "r_10.png",
    ]


def test_load_blender_shapes_and_focal(scene_dir):
    data = load_blender(scene_dir, half_res=False)
    assert set(data.splits) == {"train", "val", "test"}
    assert data.splits["train"].images.shape == (4, 32, 32, 3)
    assert data.splits["train"].poses.shape == (4, 4, 4)
    assert data.H == data.W == 32
    # f = W / (2 tan(fov/2)) with lego's fov
    expected_f = 32 / (2 * np.tan(0.6911112070083618 / 2))
    assert np.isclose(data.f, expected_f, rtol=1e-6)
    assert data.splits["train"].images.dtype == np.float32
    assert 0.0 <= data.splits["train"].images.min()
    assert data.splits["train"].images.max() <= 1.0


def test_load_blender_half_res_and_truncation(scene_dir):
    data = load_blender(scene_dir, half_res=True, num_imgs=2)
    # num_imgs truncates ALL splits (reference utils/dataload.py:55-61)
    for s in ("train", "val", "test"):
        assert len(data.splits[s]) == 2
    assert data.H == data.W == 16
    # focal computed AFTER halving (reference utils/dataload.py:101-105)
    expected_f = 16 / (2 * np.tan(0.6911112070083618 / 2))
    assert np.isclose(data.f, expected_f, rtol=1e-6)


def test_ray_dataset_layout(scene_dir):
    data = load_blender(scene_dir, half_res=False)
    rd = RayDataset.from_blender(data)
    n = 32 * 32
    assert rd.rays["train"].shape == (4 * n, 6)
    assert rd.pixels["train"].shape == (4 * n, 3)
    # camera-major: rows [i*n, (i+1)*n) all share origin = pose_i translation
    origins = np.asarray(rd.rays["train"][:, :3]).reshape(4, n, 3)
    for i in range(4):
        np.testing.assert_allclose(
            origins[i], np.tile(data.splits["train"].poses[i, :3, 3], (n, 1)),
            atol=1e-6,
        )
    # pixels match images flattened row-major
    np.testing.assert_allclose(
        np.asarray(rd.pixels["train"]),
        data.splits["train"].images.reshape(-1, 3),
    )


def test_sample_ray_batch_pairs_rays_with_pixels(scene_dir):
    data = load_blender(scene_dir, half_res=True)
    rd = RayDataset.from_blender(data)
    key = jax.random.PRNGKey(0)
    rays_b, pix_b = sample_ray_batch(
        key, rd.rays["train"], rd.pixels["train"], 64
    )
    assert rays_b.shape == (64, 6)
    assert pix_b.shape == (64, 3)
    # same key -> same batch (deterministic)
    rays_b2, pix_b2 = sample_ray_batch(
        key, rd.rays["train"], rd.pixels["train"], 64
    )
    np.testing.assert_array_equal(np.asarray(rays_b), np.asarray(rays_b2))
    # each sampled ray's pixel matches the dataset pairing
    all_rays = np.asarray(rd.rays["train"])
    all_pix = np.asarray(rd.pixels["train"])
    for r, p in zip(np.asarray(rays_b)[:5], np.asarray(pix_b)[:5]):
        matches = np.where((all_rays == r).all(axis=1))[0]
        assert any(np.allclose(all_pix[m], p) for m in matches)


def test_synthetic_scene_has_content(scene_dir):
    data = load_blender(scene_dir, half_res=False)
    imgs = data.splits["train"].images
    # scene renders something non-trivial (not all black / not saturated)
    assert imgs.max() > 0.2
    assert imgs.mean() < 0.5
    assert imgs.std() > 0.03


def test_tiny_nerf_npz_loader(tmp_path):
    from nerf_simple_tpu.data.tiny_nerf import load_tiny_nerf

    rng = np.random.default_rng(0)
    p = str(tmp_path / "tiny_nerf_data.npz")
    np.savez(
        p,
        images=rng.uniform(0, 1, (106, 20, 20, 3)).astype(np.float32),
        poses=np.tile(np.eye(4, dtype=np.float32), (106, 1, 1)),
        focal=np.float64(25.0),
    )
    data = load_tiny_nerf(p)
    assert len(data.splits["train"]) == 100
    assert len(data.splits["val"]) == 3
    assert len(data.splits["test"]) == 3
    assert data.H == data.W == 20 and data.f == 25.0
    rd = RayDataset.from_blender(data)
    assert rd.rays["train"].shape == (100 * 400, 6)


def test_sample_ray_batch_from_images(scene_dir):
    from nerf_simple_tpu.data.dataset import sample_ray_batch_from_images

    data = load_blender(scene_dir, half_res=False)
    rd = RayDataset.from_blender(data)
    n = 32 * 32
    key = jax.random.PRNGKey(0)
    rays_b, pix_b = sample_ray_batch_from_images(
        key, rd.rays["train"], rd.pixels["train"], (1, 3), n, 256
    )
    assert rays_b.shape == (256, 6)
    # every sampled ray's origin matches pose 1 or pose 3
    origins = {tuple(np.round(p, 5)) for p in data.splits["train"].poses[[1, 3], :3, 3]}
    for o in np.asarray(rays_b[:, :3]):
        assert tuple(np.round(o, 5)) in origins


def test_white_bkgd_compositing(tmp_path):
    import cv2
    import json as _json

    d = str(tmp_path / "rgba")
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(d, split))
        # RGBA image: left half opaque red, right half fully transparent
        img = np.zeros((8, 8, 4), np.uint8)
        img[:, :4] = [0, 0, 255, 255]  # BGR(A): red opaque
        img[:, 4:] = [0, 255, 0, 0]  # green but alpha 0
        cv2.imwrite(os.path.join(d, split, "r_0.png"), img)
        with open(os.path.join(d, f"transforms_{split}.json"), "w") as fh:
            _json.dump(
                {
                    "camera_angle_x": 0.69,
                    "frames": [
                        {"file_path": f"./{split}/r_0",
                         "transform_matrix": np.eye(4).tolist()}
                    ],
                },
                fh,
            )
    ref = load_blender(d, half_res=False)  # reference behavior: alpha dropped
    np.testing.assert_allclose(
        ref.splits["train"].images[0, 0, 6], [0, 1, 0], atol=1e-6
    )
    white = load_blender(d, half_res=False, white_bkgd=True)
    # transparent half becomes white; opaque half stays red
    np.testing.assert_allclose(
        white.splits["train"].images[0, 0, 6], [1, 1, 1], atol=1e-6
    )
    np.testing.assert_allclose(
        white.splits["train"].images[0, 0, 1], [1, 0, 0], atol=1e-6
    )


def test_hard_style_scene_is_sharp_and_sparse(tmp_path):
    """The hard-surface procedural style (r3): near-binary densities at
    ~2% volume occupancy — the canonical-lego regime the smooth blobs
    can't emulate. Checks the field statistics and that the written
    scene loads with visible content."""
    import jax.numpy as jnp

    from nerf_simple_tpu.data.synthetic import field

    g = jnp.stack(
        jnp.meshgrid(*([jnp.linspace(-2, 2, 32)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    sigma = field(g, style="hard")[:, 3]
    occ_frac = float((sigma > 0).mean())
    assert 0.005 < occ_frac < 0.06  # sparse like lego, not like blobs
    # near-binary: saturated interiors exist, and the soft transition
    # band is a thin shell (<2% of the volume; the blobs style by
    # contrast is ALL soft gradient)
    assert float((sigma > 30.0).mean()) > 0.001
    assert float(((sigma > 0) & (sigma < 30.0)).mean()) < 0.02

    d = str(tmp_path / "hard")
    write_blender_scene(d, n_train=2, n_val=1, n_test=1, H=24, W=24,
                        style="hard")
    data = load_blender(d, half_res=False)
    img = data.splits["train"].images[0]
    cover = float((img.sum(-1) > 0.05).mean())
    assert 0.05 < cover < 0.7  # object visible, background empty


def test_unbounded_scene_style(tmp_path):
    """The 'unbounded' procedural style: background shell visible in
    every corner pixel (no black background), central content distinct,
    GT integration reaches past the shell."""
    import numpy as np

    from nerf_simple_tpu.data.synthetic import orbit_cameras, render_gt

    poses = orbit_cameras(1)
    img = render_gt(
        poses, 32, 32, 24.0, N=256, tf=25.0, style="unbounded"
    )[0]
    # every pixel sees content (shell fills the background)
    assert (img.sum(-1) > 0.05).all()
    # corners (shell) differ from center (blob cluster)
    assert abs(img[:4, :4].mean() - img[14:18, 14:18].mean()) > 0.02
    # bounded integration (tf=6) leaves background pixels dark instead
    img6 = render_gt(poses, 32, 32, 24.0, N=256, tf=6.0, style="unbounded")[0]
    assert (img6[:4, :4].sum(-1) < 0.05).mean() > 0.5
