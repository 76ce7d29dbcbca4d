"""COLMAP sparse-model ingestion (data/colmap.py): parser parity between
the binary and text formats, pose-convention correctness against known
geometry, depth-bound percentiles, and the load_llff auto-conversion."""

import os
import struct

import numpy as np
import pytest

from nerf_simple_tpu.data.colmap import (
    colmap_to_poses_bounds,
    load_colmap_model,
    qvec_to_rotmat,
)


def _rotmat_to_qvec(R):
    """Inverse of qvec_to_rotmat (w, x, y, z)."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = np.copysign(np.sqrt(max(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2, R[2, 1] - R[1, 2])
    y = np.copysign(np.sqrt(max(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2, R[0, 2] - R[2, 0])
    z = np.copysign(np.sqrt(max(0.0, 1 - R[0, 0] - R[1, 1] + R[2, 2])) / 2, R[1, 0] - R[0, 1])
    return np.array([w, x, y, z])


def _make_model(n_imgs=4, seed=0):
    """Known NeRF-convention c2w poses -> COLMAP w2c model + 3D points."""
    rng = np.random.default_rng(seed)
    model = {"cameras": {1: dict(model="SIMPLE_PINHOLE", width=64, height=48,
                                 params=np.array([80.0, 32.0, 24.0]))},
             "images": {}, "points": {}}
    pts = rng.normal(0, 0.3, (50, 3))  # cloud near origin
    for i, p in enumerate(pts):
        model["points"][i + 10] = p
    c2ws = []
    for i in range(n_imgs):
        theta = 2 * np.pi * i / n_imgs
        c = 4.0 * np.array([np.sin(theta), np.cos(theta), 0.4])
        back = c / np.linalg.norm(c)  # NeRF back = away from origin
        up0 = np.array([0.0, 0.0, 1.0])
        right = np.cross(up0, back); right /= np.linalg.norm(right)
        up = np.cross(back, right)
        c2w = np.stack([right, up, back], axis=1)  # NeRF [r, u, b]
        c2ws.append((c2w, c))
        # COLMAP camera axes: right, down=-up, forward=-back
        R_c2w_colmap = np.stack([right, -up, -back], axis=1)
        R = R_c2w_colmap.T  # w2c
        t = -R @ c
        model["images"][i + 1] = dict(
            qvec=_rotmat_to_qvec(R), tvec=t, camera_id=1,
            name=f"im_{i:03d}.png",
            point3d_ids=np.arange(10, 10 + len(pts), dtype=np.int64),
        )
    return model, c2ws


def _write_txt(model, d):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.txt"), "w") as fh:
        fh.write("# comment line\n")
        for cid, c in model["cameras"].items():
            params = " ".join(str(p) for p in c["params"])
            fh.write(f"{cid} {c['model']} {c['width']} {c['height']} {params}\n")
    with open(os.path.join(d, "images.txt"), "w") as fh:
        fh.write("# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
        for iid, im in model["images"].items():
            q, t = im["qvec"], im["tvec"]
            fh.write(
                f"{iid} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} "
                f"{im['camera_id']} {im['name']}\n"
            )
            track = " ".join(
                f"{p:.1f} {p:.1f} {pid}" for p, pid in
                zip(range(len(im["point3d_ids"])), im["point3d_ids"])
            )
            fh.write(track + "\n")
    with open(os.path.join(d, "points3D.txt"), "w") as fh:
        for pid, xyz in model["points"].items():
            fh.write(f"{pid} {xyz[0]} {xyz[1]} {xyz[2]} 0 0 0 0.1 1 0\n")


def _write_bin(model, d):
    os.makedirs(d, exist_ok=True)
    name_to_id = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1}
    with open(os.path.join(d, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(model["cameras"])))
        for cid, c in model["cameras"].items():
            fh.write(struct.pack("<iiQQ", cid, name_to_id[c["model"]],
                                 c["width"], c["height"]))
            fh.write(struct.pack(f"<{len(c['params'])}d", *c["params"]))
    with open(os.path.join(d, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(model["images"])))
        for iid, im in model["images"].items():
            fh.write(struct.pack("<i", iid))
            fh.write(struct.pack("<4d", *im["qvec"]))
            fh.write(struct.pack("<3d", *im["tvec"]))
            fh.write(struct.pack("<i", im["camera_id"]))
            fh.write(im["name"].encode() + b"\x00")
            ids = im["point3d_ids"]
            fh.write(struct.pack("<Q", len(ids)))
            for j, pid in enumerate(ids):
                fh.write(struct.pack("<dd", float(j), float(j)))
                fh.write(struct.pack("<q", int(pid)))
    with open(os.path.join(d, "points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(model["points"])))
        for pid, xyz in model["points"].items():
            fh.write(struct.pack("<Q", pid))
            fh.write(struct.pack("<3d", *xyz))
            fh.write(struct.pack("<3B", 0, 0, 0))
            fh.write(struct.pack("<d", 0.1))
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<ii", 1, 0))


def test_qvec_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(_rotmat_to_qvec(R), q, atol=1e-12)


def test_bin_and_txt_models_parse_identically(tmp_path):
    model, _ = _make_model()
    _write_txt(model, str(tmp_path / "txt"))
    _write_bin(model, str(tmp_path / "bin"))
    ct, it_, pt = load_colmap_model(str(tmp_path / "txt"))
    cb, ib, pb = load_colmap_model(str(tmp_path / "bin"))
    assert set(ct) == set(cb) and set(it_) == set(ib) and set(pt) == set(pb)
    for k in ct:
        assert ct[k]["model"] == cb[k]["model"]
        np.testing.assert_allclose(ct[k]["params"], cb[k]["params"])
    for k in it_:
        np.testing.assert_allclose(it_[k]["qvec"], ib[k]["qvec"], atol=1e-15)
        np.testing.assert_allclose(it_[k]["tvec"], ib[k]["tvec"], atol=1e-15)
        assert it_[k]["name"] == ib[k]["name"]
        np.testing.assert_array_equal(
            it_[k]["point3d_ids"], ib[k]["point3d_ids"]
        )
    for k in pt:
        np.testing.assert_allclose(pt[k], pb[k], atol=1e-15)


def test_poses_bounds_recovers_known_geometry(tmp_path):
    model, c2ws = _make_model()
    _write_txt(model, str(tmp_path / "sparse" / "0"))
    pb = colmap_to_poses_bounds(str(tmp_path))
    assert pb.shape == (4, 17)
    for i, (c2w, c) in enumerate(c2ws):
        pose = pb[i, :15].reshape(3, 5)
        right, up, back = c2w[:, 0], c2w[:, 1], c2w[:, 2]
        # LLFF storage columns: [down, right, back, t]
        np.testing.assert_allclose(pose[:, 0], -up, atol=1e-10)
        np.testing.assert_allclose(pose[:, 1], right, atol=1e-10)
        np.testing.assert_allclose(pose[:, 2], back, atol=1e-10)
        np.testing.assert_allclose(pose[:, 3], c, atol=1e-10)
        np.testing.assert_allclose(pose[:, 4], [48, 64, 80.0])
        near, far = pb[i, 15], pb[i, 16]
        # cameras sit ~4.02 from a +-0.3-ish cloud around the origin
        assert 2.5 < near < far < 6.0


def test_load_llff_auto_converts_colmap_scene(tmp_path):
    import cv2

    from nerf_simple_tpu.data.llff import load_llff

    model, _ = _make_model()
    scene = str(tmp_path / "scene")
    _write_bin(model, os.path.join(scene, "sparse", "0"))
    img_dir = os.path.join(scene, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for im in model["images"].values():
        cv2.imwrite(
            os.path.join(img_dir, im["name"]),
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
        )
    data = load_llff(scene, factor=1, ndc=False, llffhold=2)
    assert os.path.exists(os.path.join(scene, "poses_bounds.npy"))
    assert data.H == 48 and data.W == 64
    n_train = len(data.splits["train"].images)
    n_test = len(data.splits["test"].images)
    assert n_train + n_test == 4 and n_test == 2
    assert np.isfinite(data.splits["train"].poses).all()
    assert data.world_near < data.world_far


def test_unpadded_numeric_names_pair_naturally(tmp_path):
    """frame2 vs frame10: poses_bounds must follow the NATURAL sort
    load_llff applies to image files, not lexicographic order."""
    model, c2ws = _make_model(n_imgs=4)
    # rename: frame1, frame2, frame10, frame11 (lexicographic would put
    # frame10 before frame2)
    names = ["frame1.png", "frame2.png", "frame10.png", "frame11.png"]
    for iid, name in zip(sorted(model["images"]), names):
        model["images"][iid]["name"] = name
    _write_txt(model, str(tmp_path / "sparse" / "0"))
    pb = colmap_to_poses_bounds(str(tmp_path))
    # row order must match the natural name order == image id order here
    for i, (c2w, c) in enumerate(c2ws):
        pose = pb[i, :15].reshape(3, 5)
        np.testing.assert_allclose(pose[:, 3], c, atol=1e-10)


def test_images_txt_blank_track_line_and_spaced_names(tmp_path):
    """COLMAP writes an EMPTY points2D line for images with no tracks,
    and filenames may contain spaces — neither may shift the pairing."""
    model, c2ws = _make_model(n_imgs=3)
    iids = sorted(model["images"])
    model["images"][iids[0]]["point3d_ids"] = np.array([], np.int64)
    model["images"][iids[1]]["name"] = "im 1 with spaces.png"
    _write_txt(model, str(tmp_path / "m"))
    _, images, _ = load_colmap_model(str(tmp_path / "m"))
    assert len(images) == 3
    assert images[iids[1]]["name"] == "im 1 with spaces.png"
    # the zero-track image parsed cleanly and the NEXT image's pose is
    # still correct (no line-pairing shift)
    np.testing.assert_allclose(
        images[iids[2]]["qvec"], model["images"][iids[2]]["qvec"], atol=1e-12
    )


def test_missing_points3d_file_uses_default_bounds(tmp_path):
    """images carry track ids but points3D.{bin,txt} is absent: bounds
    fall back to permissive defaults instead of crashing."""
    model, _ = _make_model(n_imgs=2)
    d = str(tmp_path / "sparse" / "0")
    _write_txt(model, d)
    os.remove(os.path.join(d, "points3D.txt"))
    pb = colmap_to_poses_bounds(str(tmp_path))
    assert pb.shape == (2, 17)
    np.testing.assert_allclose(pb[:, 15], 0.1)
    np.testing.assert_allclose(pb[:, 16], 100.0)


@pytest.mark.slow
def test_colmap_scene_trains_e2e(tmp_path):
    """Raw COLMAP reconstruction -> dataset: llff -> a few train steps:
    the full ingestion pipeline produces finite losses and a renderable
    model (the reference roadmap's ColMap item, end to end)."""
    import cv2

    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.train.loop import train

    model, _ = _make_model(n_imgs=6)
    scene = str(tmp_path / "scene")
    _write_bin(model, os.path.join(scene, "sparse", "0"))
    img_dir = os.path.join(scene, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for im in model["images"].values():
        # smooth gradient images so a tiny net can reduce loss
        y, x = np.mgrid[0:48, 0:64]
        img = np.stack([x * 2, y * 3, (x + y)], -1).astype(np.uint8)
        img += rng.integers(0, 10, img.shape, dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, im["name"]), img)
    cfg = TrainConfig(
        datapath=scene,
        savepath=str(tmp_path / "models"),
        exp_name="colmap_e2e",
        dataset="llff",
        llff_factor=1,
        ndc=False,
        Nf=8,
        num_iters=10,
        batch_size=64,
        steps_per_call=5,
        net_H=32,
        net_Lp=2,
        net_Ld=2,
        ckpt_loss=1000,
        ckpt_images=10**9,
        ckpt_model=10**9,
        val_idxs=(0,),
        log_dir=str(tmp_path / "logs"),
    )
    state = train(cfg)
    assert int(state.step) == 10
    assert os.path.exists(os.path.join(scene, "poses_bounds.npy"))
