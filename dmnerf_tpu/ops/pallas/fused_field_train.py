"""Trainable fused Pallas field: PE -> trunk -> heads forward AND hand-written
backward, entirely in VMEM.

Why: profiling shows the XLA train step is HBM-bound on inter-layer activations
(bf16 and fp32 matmuls take identical wall clock; throughput is flat in batch
size). This kernel never materializes activations in HBM:

- forward: the same fused kernel as ops/pallas/fused_field.py.
- backward: per point-tile, RECOMPUTE the forward activations in VMEM, then
  backprop through heads and trunk; weight/bias gradients accumulate in fp32
  directly in the VMEM-resident output buffers across the sequential TPU grid
  (grid steps run in order on a core, so out_ref[:] += is race-free);
  point/direction cotangents are produced exactly (through the positional
  encoding), so autodiff semantics match the XLA path including the
  stop_gradient of the instance branch at the trunk (dm_nerf.py:95).

HBM traffic per point drops from ~16 KB (8 layers of fp32 activations, fwd+bwd)
to ~350 B (inputs + raw + cotangents).

Weight layout (matches fused_field._flatten_params):
  [trunk_0 .. trunk_{D-1}, density, rgb_feat, rgb_hidden, rgb_out,
   ins_feat, ins_hidden, ins_out], each as (w, b).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.models.fields import FieldConfig, field_output_dim
from dmnerf_tpu.ops.pallas.fused_field import TILE_P, _pe_block

F32 = jnp.float32
# backward holds weights + fp32 weight-grad accumulators + all activations in
# VMEM; with fp32 weight operands 512-point tiles overflow the 16 MB budget,
# with bf16 weight operands (cast before the call) 512 fits
TILE_BWD = 512


def _pe_bwd(x, g_enc, multires: int):
    """Cotangent of _pe_block wrt x. x: [P, 3], g_enc: [P, 3*(1+2m)]."""
    g = g_enc[:, :3].astype(F32)
    for i in range(multires):
        f = float(2.0 ** i)
        gs = g_enc[:, 3 * (1 + 2 * i):3 * (2 + 2 * i)].astype(F32)
        gc = g_enc[:, 3 * (2 + 2 * i):3 * (3 + 2 * i)].astype(F32)
        xf = x.astype(F32) * f
        g = g + gs * jnp.cos(xf) * f - gc * jnp.sin(xf) * f
    return g


def _fwd_acts(cfg: FieldConfig, wb, pts, dirs):
    """Shared forward (used by both kernels). Returns (raw, residuals dict)."""
    dt = cfg.compute_dtype
    D = cfg.netdepth

    def dot(x, wi):
        # weights arrive in fp32 (so their cotangents stay fp32); cast to the
        # compute dtype per use — a per-tile VPU cast of ~0.6 MB, negligible
        w, b = wb[2 * wi], wb[2 * wi + 1]
        y = jnp.dot(x.astype(dt), w[:].astype(dt), preferred_element_type=F32)
        return y + b[:]

    x = _pe_block(pts, cfg.multires).astype(dt)
    d = _pe_block(dirs, cfg.multires_views).astype(dt)

    acts = []           # input of each trunk layer (dtype dt)
    h = x
    for i in range(D):
        acts.append(h)
        h = jax.nn.relu(dot(h, i)).astype(dt)
        if i == cfg.skip:
            h = jnp.concatenate([h, x], axis=-1)

    density = dot(h, D + 0)
    rgb_f = dot(h, D + 1).astype(dt)
    rgb_cat = jnp.concatenate([rgb_f, d], axis=-1)
    rgb_h = jax.nn.relu(dot(rgb_cat, D + 2)).astype(dt)
    rgb = dot(rgb_h, D + 3)
    ins_f = dot(h, D + 4).astype(dt)          # stop_gradient handled in bwd
    ins_h = jax.nn.relu(dot(ins_f, D + 5)).astype(dt)
    ins = dot(ins_h, D + 6)

    raw = jnp.concatenate([rgb, density, ins], axis=-1)
    res = dict(x=x, d=d, acts=acts, h=h, rgb_cat=rgb_cat, rgb_h=rgb_h,
               ins_f=ins_f, ins_h=ins_h)
    return raw, res


def _fwd_kernel(cfg, pts_ref, dirs_ref, *refs):
    out_ref = refs[-1]
    wb = refs[:-1]
    raw, _ = _fwd_acts(cfg, wb, pts_ref[:], dirs_ref[:])
    out_ref[:] = raw


def _bwd_kernel(cfg, pts_ref, dirs_ref, *refs):
    """refs = wb... , g_ref, then outputs: dpts, ddirs, dwb..."""
    n_w = cfg.netdepth + 7
    wb = refs[:2 * n_w]
    g_ref = refs[2 * n_w]
    dpts_ref = refs[2 * n_w + 1]
    ddirs_ref = refs[2 * n_w + 2]
    dwb = refs[2 * n_w + 3:]
    dt = cfg.compute_dtype
    D = cfg.netdepth
    W = cfg.netwidth

    pts = pts_ref[:]
    dirs = dirs_ref[:]
    g = g_ref[:]
    raw, res = _fwd_acts(cfg, wb, pts, dirs)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for r in dwb:
            r[:] = jnp.zeros_like(r)

    def wT(wi):
        return wb[2 * wi][:].astype(dt).T

    def acc(wi, a_in, dy):
        """dW += a_in^T @ dy ; db += sum(dy). dy: [P, out] f32."""
        dwb[2 * wi][:] += jnp.dot(a_in.astype(dt).T, dy.astype(dt),
                                  preferred_element_type=F32)
        dwb[2 * wi + 1][:] += jnp.sum(dy, axis=0)

    g_rgb = g[:, :3].astype(F32)
    g_sigma = g[:, 3:4].astype(F32)
    g_ins = g[:, 4:].astype(F32)

    # --- ins head (stops at the trunk: no contribution to dh) ---
    d_ins_h = jnp.dot(g_ins.astype(dt), wT(D + 6), preferred_element_type=F32)
    acc(D + 6, res["ins_h"], g_ins)
    d_ins_f = d_ins_h * (res["ins_h"].astype(F32) > 0)
    acc(D + 5, res["ins_f"], d_ins_f)
    d_ins_in = jnp.dot(d_ins_f.astype(dt), wT(D + 5), preferred_element_type=F32)
    acc(D + 4, res["h"], d_ins_in)
    # stop_gradient: d_ins_in does NOT propagate into dh

    # --- rgb head ---
    d_rgb_h = jnp.dot(g_rgb.astype(dt), wT(D + 3), preferred_element_type=F32)
    acc(D + 3, res["rgb_h"], g_rgb)
    d_rgb_cat = d_rgb_h * (res["rgb_h"].astype(F32) > 0)
    acc(D + 2, res["rgb_cat"], d_rgb_cat)
    d_cat = jnp.dot(d_rgb_cat.astype(dt), wT(D + 2), preferred_element_type=F32)
    d_rgb_f = d_cat[:, :W]
    g_d_enc = d_cat[:, W:]                     # cotangent into dir encoding
    acc(D + 1, res["h"], d_rgb_f)
    dh = jnp.dot(d_rgb_f.astype(dt), wT(D + 1), preferred_element_type=F32)

    # --- density head ---
    acc(D + 0, res["h"], g_sigma)
    dh = dh + jnp.dot(g_sigma.astype(dt), wT(D + 0), preferred_element_type=F32)

    # --- trunk (reverse), collecting the encoding cotangent ---
    g_x_enc = jnp.zeros_like(res["x"], dtype=F32)
    for i in range(D - 1, -1, -1):
        if i == cfg.skip:
            g_x_enc = g_x_enc + dh[:, W:]
            dh = dh[:, :W]
        # recompute this layer's relu output for the mask
        w, b = wb[2 * i], wb[2 * i + 1]
        pre = jnp.dot(res["acts"][i].astype(dt), w[:].astype(dt),
                      preferred_element_type=F32) + b[:]
        dy = dh * (pre > 0)
        acc(i, res["acts"][i], dy)
        dh = jnp.dot(dy.astype(dt), wT(i), preferred_element_type=F32)
    g_x_enc = g_x_enc + dh

    dpts_ref[:] = _pe_bwd(pts, g_x_enc, cfg.multires)
    ddirs_ref[:] = _pe_bwd(dirs, g_d_enc, cfg.multires_views)


def _shapes(cfg: FieldConfig):
    # shape metadata without materializing params
    D, W = cfg.netdepth, cfg.netwidth
    pos, view = cfg.pos_ch, cfg.view_ch
    dims = []
    in_dim = pos
    for i in range(D):
        dims.append((in_dim, W))
        in_dim = W + pos if i == cfg.skip else W
    dims += [(W, 1), (W, W), (W + view, W // 2), (W // 2, 3),
             (W, W), (W, W // 2), (W // 2, cfg.ins_num + 1)]
    return dims


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_field_flat(cfg: FieldConfig, pts, dirs, *wb):
    """pts, dirs: [P, 3] (P multiple of TILE_P); wb: flat (w, b) pairs in
    compute dtype for w, fp32 for b. Returns raw [P, C] fp32."""
    return _fused_fwd_call(cfg, pts, dirs, wb)


def _fused_fwd_call(cfg, pts, dirs, wb):
    n = pts.shape[0]
    out_dim = field_output_dim(cfg)
    pt_spec = pl.BlockSpec((TILE_P, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in wb]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(n // TILE_P,),
        in_specs=[pt_spec, pt_spec] + w_specs,
        out_specs=pl.BlockSpec((TILE_P, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), F32),
        interpret=jax.default_backend() != "tpu",
    )(pts, dirs, *wb)


def _fused_fwd(cfg, pts, dirs, *wb):
    raw = _fused_fwd_call(cfg, pts, dirs, wb)
    return raw, (pts, dirs, wb)


def _fused_bwd(cfg, residuals, g):
    pts, dirs, wb = residuals
    # weight OPERANDS go in as compute-dtype copies (halves their VMEM
    # footprint, enabling the larger tile); the returned cotangents are fp32
    # accumulators and are cast back to the fp32 primal dtype below
    wb_in = tuple(
        w.astype(cfg.compute_dtype) if w.ndim == 2 else w for w in wb)
    n = pts.shape[0]
    out_dim = field_output_dim(cfg)
    pt_spec = pl.BlockSpec((TILE_BWD, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in wb]
    g_spec = pl.BlockSpec((TILE_BWD, out_dim), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = ([jax.ShapeDtypeStruct((n, 3), F32),
                   jax.ShapeDtypeStruct((n, 3), F32)]
                  + [jax.ShapeDtypeStruct(w.shape, F32) for w in wb])
    out_specs = [pt_spec, pt_spec] + [full for _ in wb]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(n // TILE_BWD,),
        in_specs=[pt_spec, pt_spec] + w_specs + [g_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=jax.default_backend() != "tpu",
    )(pts, dirs, *wb_in, g)
    dpts, ddirs = outs[0], outs[1]
    dwb = tuple(d.astype(w.dtype) for d, w in zip(outs[2:], wb))  # fp32 == fp32
    return (dpts, ddirs) + dwb


fused_field_flat.defvjp(_fused_fwd, _fused_bwd)


def make_trainable_pallas_field(cfg: FieldConfig):
    """Returns field(params, pts [R,S,3], viewdirs [R,1,3]) -> raw [R,S,C],
    differentiable wrt params (and pts/dirs), drop-in for apply_field."""
    from dmnerf_tpu.ops.pallas.fused_field import _flatten_params

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
        wb = _flatten_params(params, jnp.float32)
        raw = fused_field_flat(cfg, pts_flat, dirs_flat, *wb)
        if n_pad:
            raw = raw[:n]
        return raw.reshape(R, S, -1)

    return field
