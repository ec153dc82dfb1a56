"""Fused Pallas TPU kernel for the DM-NeRF field: PE -> 8-layer MLP -> heads,
entirely in VMEM.

Why: the XLA path writes each [P, 256] activation to HBM between layers; at the
reference workload (786k points/step) that is ~GBs of HBM traffic per forward —
more time than the matmul FLOPs themselves. This kernel keeps the whole network
(weights ~1.5 MB bf16) and the per-tile activations resident in VMEM, so HBM
traffic is just 24 B/point in + (4+K+1)*4 B/point out.

Layout: grid over point tiles (TILE_P points each); every weight is a whole-array
VMEM operand (broadcast to all grid steps); the positional encoding is generated
on the VPU inside the kernel, so encoded features never exist in HBM.

Used on the no-grad render paths (eval/manipulate/mesh). Training uses the XLA
path (autodiff); a custom-VJP pallas training kernel is future work.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.models.fields import FieldConfig, field_output_dim

TILE_P = 1024  # forward tiles are light on VMEM; bigger tiles amortize matmul overhead


def _pe_block(x, multires: int):
    """In-kernel positional encoding: concat([x, sin(f x), cos(f x), ...], -1)."""
    parts = [x]
    for i in range(multires):
        f = float(2.0 ** i)
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def _field_kernel(cfg: FieldConfig, n_w: int, pts_ref, dirs_ref, *refs):
    """refs = [w0, b0, w1, b1, ...] followed by out_ref."""
    out_ref = refs[-1]
    wb = refs[:-1]
    dt = cfg.compute_dtype

    def dot(x, wi):
        w, b = wb[2 * wi], wb[2 * wi + 1]
        y = jnp.dot(x.astype(dt), w[:], preferred_element_type=jnp.float32)
        return y + b[:]

    x = _pe_block(pts_ref[:], cfg.multires)
    d = _pe_block(dirs_ref[:], cfg.multires_views)

    h = x
    for i in range(cfg.netdepth):
        h = jax.nn.relu(dot(h, i))
        if i == cfg.skip:
            h = jnp.concatenate([h, x], axis=-1)

    D = cfg.netdepth
    density = dot(h, D + 0)
    rgb_f = dot(h, D + 1)
    rgb_f = jnp.concatenate([rgb_f, d], axis=-1)
    rgb_f = jax.nn.relu(dot(rgb_f, D + 2))
    rgb = dot(rgb_f, D + 3)
    ins_f = dot(h, D + 4)
    ins_f = jax.nn.relu(dot(ins_f, D + 5))
    ins = dot(ins_f, D + 6)

    out_ref[:] = jnp.concatenate([rgb, density, ins], axis=-1)


def _flatten_params(params, dt):
    """Order: trunk layers, density, rgb_feat, rgb_hidden, rgb_out, ins_feat,
    ins_hidden, ins_out — matching _field_kernel's dot() indices."""
    seq = list(params["trunk"]) + [params[k] for k in
                                   ("density", "rgb_feat", "rgb_hidden", "rgb_out",
                                    "ins_feat", "ins_hidden", "ins_out")]
    flat = []
    for layer in seq:
        flat.append(layer["w"].astype(dt))
        flat.append(layer["b"].astype(jnp.float32))
    return flat


@functools.partial(jax.jit, static_argnums=(0,))
def _pallas_forward(cfg: FieldConfig, pts_flat, dirs_flat, *wb):
    n = pts_flat.shape[0]
    assert n % TILE_P == 0
    out_dim = field_output_dim(cfg)
    n_w = len(wb) // 2

    grid = (n // TILE_P,)
    pt_spec = pl.BlockSpec((TILE_P, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in wb]
    out_spec = pl.BlockSpec((TILE_P, out_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_field_kernel, cfg, n_w)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pt_spec, pt_spec] + w_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
    )(pts_flat, dirs_flat, *wb)


def make_pallas_field(cfg: FieldConfig):
    """Returns field(params, pts [R,S,3], viewdirs [R,1,3]) -> raw [R,S,C]."""

    def field(params, pts, viewdirs):
        R, S = pts.shape[:2]
        n = R * S
        n_pad = (-n) % TILE_P
        pts_flat = pts.reshape(n, 3)
        dirs_flat = jnp.broadcast_to(viewdirs, pts.shape).reshape(n, 3)
        if n_pad:
            pts_flat = jnp.concatenate(
                [pts_flat, jnp.zeros((n_pad, 3), pts_flat.dtype)], 0)
            dirs_flat = jnp.concatenate(
                [dirs_flat, jnp.ones((n_pad, 3), dirs_flat.dtype)], 0)
        wb = _flatten_params(params, cfg.compute_dtype)
        raw = _pallas_forward(cfg, pts_flat, dirs_flat, *wb)
        if n_pad:
            raw = raw[:n]
        return raw.reshape(R, S, -1)

    return field
