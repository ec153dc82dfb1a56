"""Marching tetrahedra, PLY IO, cleanup, oriented bounds."""

import os

import numpy as np

from dmnerf_tpu.mesh.cleanup import clean_mesh
from dmnerf_tpu.mesh.grid import grid_within_bound, oriented_bounds_pca
from dmnerf_tpu.mesh.marching import marching_tetrahedra
from dmnerf_tpu.mesh.ply import read_ply, write_ply


def _sphere_volume(dim=32, r=10.0):
    t = np.arange(dim) - dim / 2
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    return (r - np.sqrt(x ** 2 + y ** 2 + z ** 2)).astype(np.float32)


def test_marching_tetrahedra_sphere():
    vol = _sphere_volume()
    verts, faces, normals = marching_tetrahedra(vol, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices should lie on the r=10 sphere around the center
    d = np.linalg.norm(verts - 16.0, axis=-1)
    assert abs(d.mean() - 10.0) < 0.2
    assert d.std() < 0.2
    # normals point outward (toward decreasing field = -gradient... here field
    # decreases outward, 'ascent' normals point inward toward the center)
    to_center = (16.0 - verts)
    to_center /= np.linalg.norm(to_center, axis=-1, keepdims=True)
    cosang = (normals * to_center).sum(-1)
    assert (np.abs(cosang) > 0.9).mean() > 0.95
    # faces reference valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0


def test_marching_tetrahedra_empty():
    vol = np.zeros((8, 8, 8), np.float32)
    verts, faces, normals = marching_tetrahedra(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_marching_watertight_edges():
    """Every interior edge of the sphere mesh should be shared by exactly 2 faces."""
    vol = _sphere_volume(24, 8.0)
    _, faces, _ = marching_tetrahedra(vol, 0.0)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0)
    edges = np.sort(edges, 1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(50, 3)).astype(np.float32)
    f = rng.integers(0, 50, (30, 3))
    c = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    for binary in (True, False):
        p = os.path.join(tmp_path, f"m_{binary}.ply")
        write_ply(p, v, f, vertex_colors=c, binary=binary)
        v2, f2 = read_ply(p)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        np.testing.assert_array_equal(f2, f)


def test_clean_mesh_removes_small_clusters():
    # two disjoint triangles strips: one big (10 tris), one small (1 tri)
    v_big = np.array([[i, j, 0] for i in range(7) for j in range(2)], float)
    f_big = []
    for i in range(6):
        a = 2 * i
        f_big += [(a, a + 1, a + 2), (a + 1, a + 3, a + 2)]
    n = len(v_big)
    v_small = np.array([[100, 100, 0], [101, 100, 0], [100, 101, 0]], float)
    f_small = [(n, n + 1, n + 2)]
    verts = np.concatenate([v_big, v_small])
    faces = np.array(f_big + f_small)
    v2, f2, _ = clean_mesh(verts, faces, min_num_cluster=5)
    assert len(f2) == len(f_big)
    assert len(v2) == len(v_big)
    assert f2.max() < len(v2)


def test_oriented_bounds_recovers_axis_box():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (2000, 3)) * np.array([4.0, 2.0, 1.0]) + np.array([5, -3, 2])
    to_origin, extents = oriented_bounds_pca(pts)
    # transformed points centered at origin within extents
    local = pts @ to_origin[:3, :3].T + to_origin[:3, 3]
    assert np.abs(local.mean(0)).max() < 0.1
    np.testing.assert_allclose(np.sort(extents), np.sort(local.max(0) - local.min(0)),
                               rtol=1e-6)
    grid, scale = grid_within_bound([-1, 1], extents, np.linalg.inv(to_origin), 8)
    assert grid.shape == (512, 3)


def test_native_matches_numpy():
    """C++ extension emits the same vertex/face set as the numpy fallback."""
    from dmnerf_tpu import native

    if native.load() is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    vol = _sphere_volume(20, 6.0)
    v1, f1, n1 = marching_tetrahedra(vol, 0.0, use_native=True)
    v2, f2, n2 = marching_tetrahedra(vol, 0.0, use_native=False)
    assert len(v1) == len(v2) and len(f1) == len(f2)
    sv1 = np.array(sorted(map(tuple, np.round(v1, 4))))
    sv2 = np.array(sorted(map(tuple, np.round(v2, 4))))
    np.testing.assert_allclose(sv1, sv2, atol=1e-3)
