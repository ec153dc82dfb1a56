"""Mesh extraction pipeline: density-grid query -> occupancy -> marching
tetrahedra -> cleanup -> per-vertex instance coloring -> PLY export.

Parity with /root/reference/tools/mesh_generator.py:12-143:
- 256^3 grid in scene bounds (GT ply oriented bounds, hardcoded-extents default
  [1.9, 7.0, 7.0]); axis swap [0,2,1] with y-negation (:28-29).
- fine-model density query with zero viewdirs, chunked (:36-49).
- occupancy = 1 - exp(-relu(sigma) * voxel), voxel = (far-near)/N_importance,
  iso level 0.45 (:54-68).
- canonical [-1,1] remap, extent scaling, scene transform (:76-86).
- cluster cleanup (min 400 tris) (:93-98).
- per-vertex label: rays from vertices along -normal, offset 0.03*near, full
  coarse->fine render, argmax of composited instance map (:106-137).
- exports {expname}.ply and color_{expname}.ply (:89-90,139-142).

TPU notes: density queries and the vertex-coloring renders run through the same
fixed-chunk jitted renderer as eval (one compile); marching cubes and
cleanup are host-side numpy.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.mesh.cleanup import clean_mesh
from dmnerf_tpu.mesh.grid import grid_within_bound, oriented_bounds
from dmnerf_tpu.mesh.marching import marching_cubes
from dmnerf_tpu.mesh.ply import read_ply, write_ply
from dmnerf_tpu.models.fields import FieldConfig, apply_field
from dmnerf_tpu.utils.viz import render_label2world


def make_density_fn(cfg: FieldConfig, chunk: int):
    """Chunked density query with zero viewdirs (mesh_generator.py:43)."""

    @jax.jit
    def density_chunk(params, pts):
        raw = apply_field(params, cfg, pts, jnp.zeros_like(pts))
        return raw[..., 3]

    def query(params, pts_np: np.ndarray) -> np.ndarray:
        n = pts_np.shape[0]
        n_pad = (-n) % chunk
        pts = np.concatenate([pts_np, np.zeros((n_pad, 3), pts_np.dtype)], 0) \
            if n_pad else pts_np
        out = [np.asarray(density_chunk(params, jnp.asarray(pts[s:s + chunk])))
               for s in range(0, len(pts), chunk)]
        return np.concatenate(out)[:n]

    return query


def extract_mesh(params, cfg: FieldConfig, args,
                 scene_ply_path: Optional[str], save_dir: str,
                 ins_rgbs=None, color_dict=None, ins_map=None):
    """Full pipeline. Returns (vertices, faces, labels)."""
    grid_dim = int(getattr(args, "mesh_grid_dim", 256))
    level = float(getattr(args, "mesh_level", 0.45))
    extents = np.array([float(x) for x in
                        str(getattr(args, "mesh_extents", "1.9,7.0,7.0")).split(",")])

    if scene_ply_path and os.path.exists(scene_ply_path):
        verts_gt, _ = read_ply(scene_ply_path)
        to_origin, _ = oriented_bounds(verts_gt)
        scene_transform = np.linalg.inv(to_origin)
    else:
        scene_transform = np.eye(4)

    grid_pts, _ = grid_within_bound([-1.0, 1.0], extents, scene_transform, grid_dim)
    # axis convention swap (mesh_generator.py:28-29)
    q = grid_pts[:, [0, 2, 1]].copy()
    q[:, 1] *= -1

    density = make_density_fn(cfg, args.N_test)(params["fine"], q.astype(np.float32))
    voxel = (args.far - args.near) / args.N_importance
    occ = 1.0 - np.exp(-np.maximum(density, 0.0) * voxel)
    occ = occ.reshape(grid_dim, grid_dim, grid_dim)

    verts_idx, faces, _ = marching_cubes(occ, level)
    if len(faces) == 0:
        print("extract_mesh: empty isosurface")
        return verts_idx, faces, None

    # index coords -> [-1,1] canonical -> scene coords (mesh_generator.py:71-86)
    verts = verts_idx / (grid_dim - 1)
    verts = (verts - 0.5) * 2.0
    verts = verts * (extents / 2.0)
    verts = verts @ scene_transform[:3, :3].T + scene_transform[:3, 3]

    os.makedirs(save_dir, exist_ok=True)
    write_ply(os.path.join(save_dir, args.expname + ".ply"), verts, faces)

    verts_c, faces_c, _ = clean_mesh(verts, faces, min_num_cluster=400)
    if len(faces_c) == 0:
        verts_c, faces_c = verts, faces

    # vertex normals (area-weighted) for coloring rays
    vn = np.zeros_like(verts_c)
    tri = verts_c[faces_c]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    for k in range(3):
        np.add.at(vn, faces_c[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)

    rays_d = -vn[:, [0, 2, 1]].copy()
    rays_d[:, 1] *= -1
    v_sw = verts_c[:, [0, 2, 1]].copy()
    v_sw[:, 1] *= -1
    rays_o = v_sw - rays_d * 0.03 * args.near

    # vertex-coloring rays march from just behind the vertex: the reference
    # uses FIXED near=0.01/far=15 here (mesh_generator.py:119), NOT the scene
    # near/far — scene near would start the ray past the surface
    from dmnerf_tpu.eval.renderer import make_chunk_renderer, render_rays_chunked
    color_chunk = make_chunk_renderer(cfg, args.N_samples, args.N_importance,
                                      0.01, 15.0, args.N_test)
    _, ins, _ = render_rays_chunked(color_chunk, params,
                                    rays_o.astype(np.float32),
                                    rays_d.astype(np.float32), args.N_test)
    labels = np.argmax(ins, axis=-1)

    if ins_rgbs is not None and color_dict is not None and ins_map is not None:
        colors = render_label2world(labels, ins_rgbs, color_dict, ins_map)
    else:
        rng = np.random.default_rng(0)
        palette = rng.integers(0, 255, (int(labels.max()) + 1, 3))
        colors = palette[labels]
    write_ply(os.path.join(save_dir, "color_" + args.expname + ".ply"),
              verts_c, faces_c, vertex_colors=colors.astype(np.uint8))
    print(f"extract_mesh: {len(verts_c)} verts, {len(faces_c)} faces -> {save_dir}")
    return verts_c, faces_c, labels
