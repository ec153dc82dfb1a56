"""3D query-grid construction for meshing.

Parity with /root/reference/tools/visualizer.py:111-155 (make_3D_grid /
grid_within_bound): a normalized [-1, 1]^3 grid of grid_dim^3 points, scaled by
extents/2 and transformed by the scene's oriented-bounds transform.

The reference obtains the transform from a GT .ply via trimesh's exact oriented
bounds; trimesh is unavailable, so oriented_bounds here is the PCA approximation
(principal axes of the vertex cloud). Config-driven extents remain the default
knob (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def oriented_bounds_pca(vertices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """PCA-approximate oriented bounding box.

    Returns (to_origin [4,4], extents [3]): to_origin maps scene coords into the
    box frame centered at the origin (same contract as trimesh.bounds.oriented_bounds).
    """
    v = np.asarray(vertices, np.float64)
    centroid = v.mean(0)
    cov = np.cov((v - centroid).T)
    _, vecs = np.linalg.eigh(cov)
    R = vecs[:, ::-1].T  # principal axes, descending variance
    if np.linalg.det(R) < 0:
        R[2] *= -1
    local = (v - centroid) @ R.T
    lo, hi = local.min(0), local.max(0)
    extents = hi - lo
    center_local = (lo + hi) / 2
    to_origin = np.eye(4)
    to_origin[:3, :3] = R
    to_origin[:3, 3] = -(R @ centroid + center_local)
    return to_origin, extents


def make_3d_grid(occ_range, dim: int, transform: np.ndarray = None,
                 scale: np.ndarray = None) -> np.ndarray:
    t = np.linspace(occ_range[0], occ_range[1], dim)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    grid = np.stack([gx, gy, gz], -1)
    if scale is not None:
        grid = grid * scale
    if transform is not None:
        grid = grid @ transform[:3, :3].T + transform[:3, 3]
    return grid


def grid_within_bound(occ_range, extents: np.ndarray, transform: np.ndarray,
                      grid_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    range_dist = occ_range[1] - occ_range[0]
    scene_scale = np.asarray(extents, np.float64) / range_dist
    grid = make_3d_grid(occ_range, grid_dim, transform=transform, scale=scene_scale)
    return grid.reshape(-1, 3), scene_scale
