"""Ray generation from camera intrinsics + pose.

Parity: the intrinsics-matrix form (/root/reference/networks/helpers.py:50-61,
``get_rays_k``) is the only one used by the reference pipeline; camera-convention
sign differences live in each dataset's K (see data loaders).

TPU design: ray generation is a pure jnp function usable inside jit. For training,
pixel indices are sampled with jax.random inside the step and rays are generated
on-device for just those pixels (the reference builds the full H*W grid every step
and gathers; we gather pixel coordinates first, then compute only N_train rays).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_grid(H: int, W: int, dtype=jnp.float32):
    """(i, j) pixel-center coordinates with i = column (x), j = row (y)."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij")
    return i, j


def ray_dirs_cam(i: jnp.ndarray, j: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame ray directions for pixel coords (i=x, j=y), any shape.

    dirs = [(i - cx)/fx, (j - cy)/fy, K22] — matches get_rays_k including the
    dataset-specific sign conventions baked into K.
    """
    dirs = jnp.stack([
        (i - K[0, 2]) / K[0, 0],
        (j - K[1, 2]) / K[1, 1],
        K[2, 2] * jnp.ones_like(i),
    ], axis=-1)
    return dirs


def get_rays(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray):
    """Full-image rays. Returns (rays_o, rays_d), each [H, W, 3]."""
    i, j = pixel_grid(H, W)
    dirs = ray_dirs_cam(i, j, K)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rays_at_pixels(pix_idx: jnp.ndarray, W: int, K: jnp.ndarray, c2w: jnp.ndarray):
    """Rays for flat pixel indices (row-major over [H, W]). pix_idx: [N] int.

    Returns (rays_o, rays_d) each [N, 3]. This is the train-time path: only the
    selected N_train pixels are turned into rays (device-side gather-then-compute
    instead of the reference's compute-then-gather, helpers.py:99-111).
    """
    pix_idx = pix_idx.astype(jnp.int32)
    j = (pix_idx // W).astype(jnp.float32)  # row
    i = (pix_idx % W).astype(jnp.float32)   # col
    dirs = ray_dirs_cam(i, j, K)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d
