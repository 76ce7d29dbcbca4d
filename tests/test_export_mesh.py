"""Mesh export (export_mesh.py): marching-tetrahedra correctness on
analytic fields and the checkpoint-to-obj pipeline."""

import os

import numpy as np

from nerf_simple_tpu.export_mesh import (
    density_grid,
    extract_mesh,
    marching_tetrahedra,
    write_obj,
)


def _sphere_grid(R, aabb, radius):
    xs = np.linspace(-aabb, aabb, R + 1, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    return 2.0 - r  # iso=2-radius surfaces at |x| = radius


def test_marching_tets_recovers_sphere():
    R, aabb, radius = 48, 1.5, 1.0
    grid = _sphere_grid(R, aabb, radius)
    verts, faces = marching_tetrahedra(grid, iso=2.0 - radius, aabb=aabb)
    assert len(verts) > 1000 and len(faces) == len(verts) // 3
    radii = np.linalg.norm(verts, axis=-1)
    cell = 2 * aabb / R
    # every surface vertex sits on the sphere to within a cell
    assert np.all(np.abs(radii - radius) < cell), (
        radii.min(), radii.max()
    )
    # surface area approx 4*pi*r^2 via triangle areas (within 10%)
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
    assert abs(area - 4 * np.pi * radius**2) < 0.1 * 4 * np.pi


def test_marching_tets_empty_and_full_grids():
    grid = np.zeros((9, 9, 9), np.float32)
    v, f = marching_tetrahedra(grid, iso=1.0, aabb=1.0)
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra(grid + 5.0, iso=1.0, aabb=1.0)
    assert len(v) == 0 and len(f) == 0


def test_write_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, verts, faces)
    lines = open(p).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == 3
    assert any(l == "f 1 2 3" for l in lines)


def test_extract_mesh_from_params(tmp_path):
    """Checkpoint -> density grid -> obj: runs end to end on a fresh
    (untrained) net and writes a valid file (possibly few faces)."""
    import jax

    from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params

    model = NerfMLP(Lp=2, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    out = str(tmp_path / "mesh.obj")
    verts, faces = extract_mesh(
        params, model, out, R=16, aabb=1.0, iso=0.8
    )
    assert os.path.exists(out)
    assert verts.shape[1] == 3 and faces.shape[1] == 3
    g = density_grid(params, model, R=8, aabb=1.0)
    assert g.shape == (9, 9, 9) and np.isfinite(g).all()
