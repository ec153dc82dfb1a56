"""Tiled full-image renderer.

The reference loops variable-size tail chunks (tester.py:63-77) which would
retrigger XLA compilation; here every chunk has the same static size (the ray
list is padded to a multiple of N_test and cropped after), so the chunk renderer
compiles exactly once. Under a device mesh each chunk is sharded over the ray
axis ('data').
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.rays import get_rays
from dmnerf_tpu.core.rendering import render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.models.fields import FieldConfig, apply_field
from dmnerf_tpu.parallel.mesh import shard_batch


def make_chunk_renderer(cfg: FieldConfig, n_samples: int, n_importance: int,
                        near: float, far: float, chunk: int, mesh=None,
                        use_pallas: bool = False):
    """Returns render_chunk(params, rays_o[chunk,3], rays_d[chunk,3])
    -> (rgb [chunk,3], ins [chunk,K], depth [chunk])."""

    if use_pallas:
        from dmnerf_tpu.ops.pallas.fused_field import make_pallas_field
        field = make_pallas_field(cfg)
    else:
        field = lambda params, pts, vd: apply_field(params, cfg, pts, vd)

    @jax.jit
    def render_chunk(params, rays_o, rays_d):
        if mesh is not None:
            rays_o, rays_d = shard_batch((rays_o, rays_d), mesh)
        coarse_fn = lambda pts, vd: field(params["coarse"], pts, vd)
        fine_fn = lambda pts, vd: field(params["fine"], pts, vd)
        z = z_val_sample(chunk, near, far, n_samples)
        out = render_rays(coarse_fn, fine_fn, rays_o, rays_d, z, n_importance,
                          key=None, perturb=False)
        return out["rgb_fine"], out["ins_fine"], out["depth_fine"]

    return render_chunk


def render_rays_chunked(render_chunk, params, rays_o: np.ndarray,
                        rays_d: np.ndarray, chunk: int):
    """Render an arbitrary ray list with the fixed-size chunk renderer."""
    n = rays_o.shape[0]
    n_pad = (-n) % chunk
    ro = np.concatenate([rays_o, np.repeat(rays_o[-1:], n_pad, 0)], 0) if n_pad else rays_o
    rd = np.concatenate([rays_d, np.repeat(rays_d[-1:], n_pad, 0)], 0) if n_pad else rays_d
    rgbs, inss, depths = [], [], []
    for s in range(0, n + n_pad, chunk):
        rgb, ins, depth = render_chunk(params,
                                       jnp.asarray(ro[s:s + chunk]),
                                       jnp.asarray(rd[s:s + chunk]))
        rgbs.append(np.asarray(rgb))
        inss.append(np.asarray(ins))
        depths.append(np.asarray(depth))
    rgb = np.concatenate(rgbs, 0)[:n]
    ins = np.concatenate(inss, 0)[:n]
    depth = np.concatenate(depths, 0)[:n]
    return rgb, ins, depth


def render_image(render_chunk, params, H: int, W: int, K: np.ndarray,
                 c2w: np.ndarray, chunk: int):
    """Render one full image -> (rgb [H,W,3], ins [H,W,Kc], depth [H,W])."""
    rays_o, rays_d = get_rays(H, W, jnp.asarray(K, jnp.float32),
                              jnp.asarray(c2w, jnp.float32))
    rays_o = np.asarray(rays_o).reshape(-1, 3)
    rays_d = np.asarray(rays_d).reshape(-1, 3)
    rgb, ins, depth = render_rays_chunked(render_chunk, params, rays_o, rays_d, chunk)
    return (rgb.reshape(H, W, 3), ins.reshape(H, W, -1), depth.reshape(H, W))
