"""COLMAP sparse-model ingestion: real-scene captures -> LLFF training.

The reference's roadmap lists "Integrate ColMap for training on real
datasets" (reference README.md:55) with no implementation. This module
closes the gap TPU-side: it parses a COLMAP sparse reconstruction
(``sparse/0/{cameras,images,points3D}.{bin,txt}`` as written by
``colmap mapper`` / ``colmap model_converter``) and converts it to the
(N, 17) ``poses_bounds.npy`` layout the LLFF pipeline consumes
(data/llff.py), following the reference LLFF ``imgs2poses`` conventions:

- w2c = [quat(R) | t] per registered image; poses stored as c2w with
  columns permuted COLMAP [right, down, forward] -> LLFF [down, right,
  back], name-sorted to match the image files on disk;
- per-image (near, far) = (0.1, 99.9) percentiles of the camera-frame
  forward depths of that image's OWN visible 3D track points (falling
  back to the global cloud when an image has no tracks).

``load_llff`` auto-invokes this when a scene directory has a COLMAP
model but no ``poses_bounds.npy`` — so ``dataset: llff`` trains directly
off a raw COLMAP reconstruction with zero extra tooling.

No COLMAP/pycolmap dependency: both the binary and text model formats
are parsed directly (formats documented at colmap.github.io/format).
"""

from __future__ import annotations

import os
import struct

import numpy as np

# COLMAP camera model id -> (name, number of params). Focal is params[0]
# for the SIMPLE_* models and fx for the rest (LLFF keeps a single f).
_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
_NAME_TO_ID = {name: mid for mid, (name, _) in _CAMERA_MODELS.items()}


def _read(fh, fmt):
    return struct.unpack(fmt, fh.read(struct.calcsize(fmt)))


def read_cameras_bin(path: str) -> dict[int, dict]:
    cams = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            cam_id, model_id, w, h = _read(fh, "<iiQQ")
            _, n_params = _CAMERA_MODELS[model_id]
            params = _read(fh, f"<{n_params}d")
            cams[cam_id] = {
                "model": _CAMERA_MODELS[model_id][0],
                "width": int(w),
                "height": int(h),
                "params": np.array(params),
            }
    return cams


def read_cameras_txt(path: str) -> dict[int, dict]:
    cams = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cams[int(parts[0])] = {
                "model": parts[1],
                "width": int(parts[2]),
                "height": int(parts[3]),
                "params": np.array([float(p) for p in parts[4:]]),
            }
    return cams


def read_images_bin(path: str) -> dict[int, dict]:
    images = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            (image_id,) = _read(fh, "<i")
            qvec = np.array(_read(fh, "<4d"))
            tvec = np.array(_read(fh, "<3d"))
            (cam_id,) = _read(fh, "<i")
            name = b""
            while True:
                c = fh.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(fh, "<Q")
            data = fh.read(24 * n_pts)  # x, y double + point3D_id int64
            pts = np.frombuffer(data, dtype=np.float64).reshape(-1, 3)
            # column 2 is an int64 bit pattern: bitwise reinterpret (the
            # same-dtype copy is a memcpy, so the bits survive the slice)
            point3d_ids = (
                np.ascontiguousarray(pts[:, 2]).view(np.int64)
                if n_pts
                else np.array([], np.int64)
            )
            images[image_id] = {
                "qvec": qvec,
                "tvec": tvec,
                "camera_id": cam_id,
                "name": name.decode("utf-8"),
                "point3d_ids": point3d_ids,
            }
    return images


def read_images_txt(path: str) -> dict[int, dict]:
    images = {}
    with open(path) as fh:
        # keep BLANK lines: COLMAP always writes the points2D line, and
        # it is empty for an image with zero 2D points — stripping blanks
        # would shift the header/track pairing for every later image
        lines = [
            l.strip() for l in fh if not l.strip().startswith("#")
        ]
    for i in range(0, len(lines), 2):
        if not lines[i]:
            continue  # trailing blank line(s)
        parts = lines[i].split()
        image_id = int(parts[0])
        track = lines[i + 1].split() if i + 1 < len(lines) else []
        point3d_ids = np.array(
            [int(track[j]) for j in range(2, len(track), 3)], np.int64
        )
        images[image_id] = {
            "qvec": np.array([float(p) for p in parts[1:5]]),
            "tvec": np.array([float(p) for p in parts[5:8]]),
            "camera_id": int(parts[8]),
            # names may contain spaces (the binary format is
            # NUL-terminated; the text row's name is everything after
            # the camera id)
            "name": " ".join(parts[9:]),
            "point3d_ids": point3d_ids,
        }
    return images


def read_points3d_bin(path: str) -> dict[int, np.ndarray]:
    pts = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            (pid,) = _read(fh, "<Q")
            xyz = np.array(_read(fh, "<3d"))
            fh.read(3)  # rgb
            _read(fh, "<d")  # error
            (track_len,) = _read(fh, "<Q")
            fh.read(8 * track_len)  # (image_id, point2D_idx) int32 pairs
            pts[int(pid)] = xyz
    return pts


def read_points3d_txt(path: str) -> dict[int, np.ndarray]:
    pts = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            pts[int(parts[0])] = np.array(
                [float(parts[1]), float(parts[2]), float(parts[3])]
            )
    return pts


def _find_model_dir(scene_dir: str) -> str | None:
    for sub in ("sparse/0", "sparse", "colmap/sparse/0", "."):
        d = os.path.join(scene_dir, sub)
        for ext in (".bin", ".txt"):
            if os.path.exists(os.path.join(d, f"images{ext}")):
                return d
    return None


def load_colmap_model(model_dir: str):
    """Read a COLMAP sparse model directory (binary or text).

    Returns (cameras, images, points3d) dicts keyed by COLMAP ids.
    """
    def pick(base, rb, rt):
        b = os.path.join(model_dir, f"{base}.bin")
        t = os.path.join(model_dir, f"{base}.txt")
        if os.path.exists(b):
            return rb(b)
        if os.path.exists(t):
            return rt(t)
        raise FileNotFoundError(f"no {base}.bin/.txt under {model_dir}")

    cameras = pick("cameras", read_cameras_bin, read_cameras_txt)
    images = pick("images", read_images_bin, read_images_txt)
    try:
        points3d = pick("points3D", read_points3d_bin, read_points3d_txt)
    except FileNotFoundError:
        points3d = {}
    return cameras, images, points3d


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def colmap_to_poses_bounds(scene_dir: str, model_dir: str | None = None):
    """Convert a COLMAP sparse model to the LLFF (N, 17) poses_bounds
    array (name-sorted to match the scene's image files).

    Rows: 3x5 ``[down | right | back | t | (H, W, f)]`` + (near, far).
    """
    model_dir = model_dir or _find_model_dir(scene_dir)
    if model_dir is None:
        raise FileNotFoundError(
            f"no COLMAP model (sparse/0/images.bin|txt) under {scene_dir}"
        )
    cameras, images, points3d = load_colmap_model(model_dir)
    cloud = (
        np.stack(list(points3d.values())) if points3d else np.zeros((0, 3))
    )

    # sort with the SAME natural key load_llff applies to the image files
    # on disk — a lexicographic sort would silently mispair poses with
    # images for unpadded numeric names (frame2 vs frame10)
    from nerf_simple_tpu.data.blender import _natural_key

    order = sorted(images, key=lambda i: _natural_key(images[i]["name"]))
    rows = []
    for iid in order:
        im = images[iid]
        cam = cameras[im["camera_id"]]
        R = qvec_to_rotmat(im["qvec"])  # w2c rotation
        t = im["tvec"]
        c2w_R = R.T
        c2w_t = -R.T @ t
        # COLMAP c2w columns [right, down, forward] -> LLFF storage
        # [down, right, back] (the imgs2poses permutation)
        pose = np.stack(
            [c2w_R[:, 1], c2w_R[:, 0], -c2w_R[:, 2], c2w_t], axis=1
        )  # (3, 4)
        f = float(cam["params"][0])
        hwf = np.array([cam["height"], cam["width"], f])[:, None]
        pose = np.concatenate([pose, hwf], axis=1)  # (3, 5)

        # near/far from the forward depths of this image's own tracks
        ids = im["point3d_ids"]
        ids = ids[ids >= 0]
        tracked = [points3d[int(i)] for i in ids if int(i) in points3d]
        # fall back to the global cloud when the image has no resolvable
        # tracks (incl. a missing points3D file: ids exist, dict empty)
        vis = np.stack(tracked) if tracked else cloud
        if len(vis):
            depths = (vis - c2w_t) @ c2w_R[:, 2]  # along camera forward
            depths = depths[depths > 0]
        else:
            depths = np.array([])
        if len(depths):
            near = float(np.percentile(depths, 0.1))
            far = float(np.percentile(depths, 99.9))
        else:
            near, far = 0.1, 100.0  # no cloud: permissive defaults
        rows.append(np.concatenate([pose.ravel(), [near, far]]))
    return np.stack(rows)


def ensure_poses_bounds(scene_dir: str) -> str:
    """Write ``poses_bounds.npy`` for a COLMAP scene if absent.

    Returns the poses_bounds path. Called by ``load_llff`` so raw COLMAP
    reconstructions train directly.
    """
    pb_path = os.path.join(scene_dir, "poses_bounds.npy")
    if not os.path.exists(pb_path):
        pb = colmap_to_poses_bounds(scene_dir)
        np.save(pb_path, pb)
        print(
            f"colmap: wrote {pb_path} ({len(pb)} registered images)"
        )
    return pb_path


def main(argv=None) -> None:
    """CLI: ``python -m nerf_simple_tpu.data.colmap <scene_dir>`` —
    the imgs2poses step without the LLFF repo."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("scene_dir")
    args = ap.parse_args(argv)
    path = ensure_poses_bounds(args.scene_dir)
    print(np.load(path).shape, "->", path)


if __name__ == "__main__":
    main()
