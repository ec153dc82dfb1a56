"""Fused Pallas TPU kernels for the DM-NeRF field (PE'd features -> trunk ->
heads), forward and custom-VJP backward, with all activations VMEM-resident.

Why (measured on v5e, reference workload 3072x192 pts): the XLA field is at its
HBM floor — each [P,256] activation round-trips HBM between layers, ~2x the
matmul time per layer — while a [512,256]x[256,256] Pallas matmul grid runs at
~170-217 TF/s (~MXU peak), *including* TN-form dW accumulation into a revisited
VMEM accumulator across 1152 grid steps. The round-1 kernel lost to XLA because
of everything around its matmuls; this rewrite removes each measured sin:

- positional encoding moved OUT of the kernel: on [T,3] lane-padded arrays the
  VPU wastes 125/128 lanes per transcendental; XLA computes the dense
  [P,63/27] encodings in ~0.04 ms and they stream into the kernel aligned.
- weights arrive PRE-PADDED to MXU-aligned shapes and PRE-CAST to the compute
  dtype (one XLA cast per step instead of ~26 per-tile casts).
- backward stores post-relu activations from its recompute, so relu masks are
  free (the old kernel re-did all trunk matmuls a third time for masks).
- head matmuls merged: rgb_feat+ins_feat as one [W,2W] matmul; the three
  output heads (rgb/density/ins) assemble the raw [T,C] via two matmuls on
  block-structured weights instead of three tiny-N matmuls + lane concats.
- in-kernel `.T` and dot_general TN forms are used freely (measured: Mosaic
  fuses them into the MXU at no cost).

Weight packing (pack_params): all padding rows/cols are zero; their gradients
are discarded by the pack's own XLA VJP (slice), so autodiff semantics are
exact, including the reference's stop_gradient of the instance branch at the
trunk (/root/reference/networks/dm_nerf.py:95) which the backward kernel
implements by *not* propagating d(ins_feat) into the trunk cotangent.

Architecture parity: /root/reference/networks/dm_nerf.py:58-106 (same math as
models/fields.apply_field, bit-identical layer structure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.core.encoding import (pe_group_permutation,
                                      positional_encoding_grouped)
from dmnerf_tpu.models.fields import FieldConfig

F32 = jnp.float32
# tile sizes are overridable for benchmarking (DMNERF_TILE_FWD/_BWD env vars)
import os as _os
TILE_FWD = int(_os.environ.get("DMNERF_TILE_FWD", 2048))
TILE_BWD = int(_os.environ.get("DMNERF_TILE_BWD", 2048))

_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB VMEM; default scoped cap is 16 MiB


def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _xpad(cfg: FieldConfig) -> int:
    """Encoded-position channels padded to a lane-friendly width."""
    return _ru(cfg.pos_ch, 64)


def _dpad(cfg: FieldConfig) -> int:
    return _ru(cfg.view_ch, 32)


def _n_packed(cfg: FieldConfig) -> int:
    return cfg.netdepth + 11


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _force_shard_map() -> bool:
    """Test-only: DMNERF_FORCE_SHARD_MAP=1 routes kernels through the
    shard_map wrapper even on a 1-device mesh, so the wrapped (Mosaic-lowered)
    path compiles and runs on real hardware — otherwise it is only ever
    exercised in CPU interpret mode (1 real chip on the bench box)."""
    return _os.environ.get("DMNERF_FORCE_SHARD_MAP", "") == "1"


def pack_params(params, cfg: FieldConfig):
    """Pack the field param pytree into MXU-aligned fp32 operands.

    Returns a flat tuple (fp32; the per-call cast to the compute dtype keeps
    custom-VJP cotangents fp32). For D=netdepth, W=netwidth, XP/DP the padded
    encoding widths, C = 4 + ins_num + 1:
      [0:D]   trunk kernels; t0 [XP,W] (rows pos_ch: zero),
              t_{skip+1} [W+XP,W] (rows W:W+pos_ch = skip-x, rest zero)
      [D]     bt   [D, W] trunk biases
      [D+1]   wf   [W, 2W] = [rgb_feat.w | ins_feat.w]
      [D+2]   bf   [2W]
      [D+3]   wrh  [W+DP, W//2] rgb_hidden (rows W+view_ch: zero)
      [D+4]   brh  [W//2]
      [D+5]   wih  [W, W//2] ins_hidden
      [D+6]   bih  [W//2]
      [D+7]   wo   [W, C]: rows 0:W//2 = rgb_out.w -> cols 0:3,
              rows W//2:W = ins_out.w -> cols 4:C, col 3 zero
      [D+8]   wd   [W, C]: col 3 = density.w, rest zero
      [D+9]   bo   [C] = [rgb_out.b, density.b, ins_out.b]
      [D+10]  marker [1] zeros (gradient-less slot, keeps arity checks simple)
    """
    D, W = cfg.netdepth, cfg.netwidth
    XP = _xpad(cfg)
    tr = params["trunk"]
    pos = cfg.pos_ch
    # the kernels consume GROUPED encodings (positional_encoding_grouped);
    # params store reference channel order, so rows that face an encoding are
    # permuted here (exact: a dot product is invariant under a consistent
    # row/channel permutation)
    permx = pe_group_permutation(cfg.multires)
    permd = pe_group_permutation(cfg.multires_views)

    t = [jnp.pad(tr[0]["w"][permx], ((0, XP - pos), (0, 0)))]
    for i in range(1, D):
        if i == cfg.skip + 1:
            w = tr[i]["w"]  # [W + pos, W] in reference row order
            t.append(jnp.concatenate(
                [w[:W], jnp.pad(w[W:][permx], ((0, XP - pos), (0, 0)))], axis=0))
        else:
            t.append(tr[i]["w"])
    bt = jnp.stack([tr[i]["b"] for i in range(D)])

    wf = jnp.concatenate([params["rgb_feat"]["w"], params["ins_feat"]["w"]], axis=1)
    bf = jnp.concatenate([params["rgb_feat"]["b"], params["ins_feat"]["b"]])
    wrh_raw = params["rgb_hidden"]["w"]  # [W + view_ch, W//2]
    wrh_raw = jnp.concatenate([wrh_raw[:W], wrh_raw[W:][permd]], axis=0)
    wrh = jnp.pad(wrh_raw, ((0, W + _dpad(cfg) - wrh_raw.shape[0]), (0, 0)))
    wih = params["ins_hidden"]["w"]

    C = 4 + cfg.ins_num + 1
    wo = jnp.zeros((W, C), F32)
    wo = wo.at[0:W // 2, 0:3].set(params["rgb_out"]["w"])
    wo = wo.at[W // 2:W, 4:C].set(params["ins_out"]["w"])
    wd = jnp.zeros((W, C), F32)
    wd = wd.at[:, 3:4].set(params["density"]["w"])
    bo = jnp.concatenate([params["rgb_out"]["b"], params["density"]["b"],
                          params["ins_out"]["b"]])
    return tuple(t) + (bt, wf, bf, wrh, params["rgb_hidden"]["b"], wih,
                       params["ins_hidden"]["b"], wo, wd, bo, jnp.zeros((1,), F32))


def encode_pos(pts, cfg: FieldConfig, dtype):
    """GROUPED PE + flatten + pad for the position stream: [..,3] ->
    [P, XP] in `dtype`. Flatten-first keeps everything rank-2 (the rank-3
    grouped PE is already layout-friendly, but 2-D in, 2-D out lets XLA fuse
    the pad + cast into the sin/cos producer)."""
    n = pts.shape[0] * pts.shape[1] if pts.ndim == 3 else pts.shape[0]
    flat = pts.reshape(n, 3)
    enc = positional_encoding_grouped(flat, cfg.multires).astype(dtype)
    return jnp.pad(enc, ((0, 0), (0, _xpad(cfg) - enc.shape[1])))


def encode_inputs(pts, viewdirs, cfg: FieldConfig, dtype):
    """XLA-side grouped PE + flatten + pad (weights permuted in pack_params):
    [R,S,3] pts, [R,1,3] dirs -> enc_x [P, XP], enc_d [P, DP] (P = R*S)."""
    enc_x = encode_pos(pts, cfg, dtype)
    n = enc_x.shape[0]
    dirs = jnp.broadcast_to(viewdirs, pts.shape).reshape(n, 3)
    enc_d = positional_encoding_grouped(dirs, cfg.multires_views).astype(dtype)
    enc_d = jnp.pad(enc_d, ((0, 0), (0, _dpad(cfg) - enc_d.shape[1])))
    return enc_x, enc_d


# In-kernel PE was tried and REVERTED (round 3): computing the encodings
# inside the kernels from raw [T,8] points (one [T,8]x[8,42] matmul + one
# sin + one cos per tile) removes the XLA-side encode chain but measured
# 43.5 ms/step vs 37.7 train and 261k vs 278k rays/s eval render — the VPU
# transcendentals serialize against the MXU trunk within each tile, the same
# finding that moved PE out of the round-1 kernel. XLA-side grouped PE
# (positional_encoding_grouped + row-permuted weights) is the keeper: same
# values, rank-2 end to end.


def _fwd_body(cfg: FieldConfig, x, d, wb, save_acts: bool = False):
    """Shared forward math on one tile. x [T,XP], d [T,DP] in compute dtype.
    Returns (raw [T,C] f32, activations dict or None)."""
    dt = cfg.compute_dtype
    D, W = cfg.netdepth, cfg.netwidth
    t, bt = wb[0:D], wb[D]
    wf, bf, wrh, brh, wih, bih, wo, wd, bo = wb[D + 1:D + 10]

    def mm(a, w):
        return jnp.dot(a, w[:], preferred_element_type=F32)

    hs = []
    a = x
    h = x
    for i in range(D):
        h = jnp.maximum(mm(a, t[i]) + bt[i], 0.0).astype(dt)
        hs.append(h)
        a = jnp.concatenate([h, x], axis=-1) if i == cfg.skip else h

    feat = (mm(h, wf) + bf[:]).astype(dt)
    rgb_f = feat[:, :W]
    ins_f = feat[:, W:]
    rgb_cat = jnp.concatenate([rgb_f, d], axis=-1)          # [T, W+DP]
    rgb_h = jnp.maximum(mm(rgb_cat, wrh) + brh[:], 0.0).astype(dt)
    ins_h = jnp.maximum(mm(ins_f, wih) + bih[:], 0.0).astype(dt)
    hh = jnp.concatenate([rgb_h, ins_h], axis=-1)           # [T, W]
    raw = mm(hh, wo) + mm(h, wd) + bo[:]                    # [T, C] f32

    if not save_acts:
        return raw, None
    return raw, dict(hs=hs, h=h, ins_f=ins_f, rgb_cat=rgb_cat,
                     rgb_h=rgb_h, ins_h=ins_h, hh=hh)


def _fwd_kernel(cfg, x_ref, d_ref, *refs):
    out_ref = refs[-1]
    raw, _ = _fwd_body(cfg, x_ref[:], d_ref[:], refs[:-1])
    out_ref[:] = raw


def _bwd_kernel(cfg, x_ref, d_ref, *refs):
    """refs = packed weights (N), g, then outputs:
    dx, dd, then N-1 fp32 grad accumulators (the marker has no accumulator)."""
    NP = _n_packed(cfg)
    D, W = cfg.netdepth, cfg.netwidth
    HW = W // 2
    wb = refs[:NP]
    g_ref = refs[NP]
    dx_ref, dd_ref = refs[NP + 1], refs[NP + 2]
    acc = refs[NP + 3:]
    dts, (dbt, dwf, dbf, dwrh, dbrh, dwih, dbih, dwo, dwd, dbo) = \
        acc[:D], acc[D:]
    dt = cfg.compute_dtype
    t = wb[0:D]
    wf, _, wrh, _, wih, _, wo, wd, _ = wb[D + 1:D + 10]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in acc:
            r[:] = jnp.zeros_like(r)

    x, d = x_ref[:], d_ref[:]
    g = g_ref[:]
    _, res = _fwd_body(cfg, x, d, wb, save_acts=True)
    hs, h, hh = res["hs"], res["h"], res["hh"]

    def tn(a, dy):
        """dW = a^T @ dy without materializing the transpose (MXU TN form)."""
        return jax.lax.dot_general(a, dy.astype(dt), (((0,), (0,)), ((), ())),
                                   preferred_element_type=F32)

    gb = g.astype(dt)
    # raw = hh@wo + h@wd + bo
    dwo[:] += tn(hh, gb)
    dwd[:] += tn(h, gb)
    dbo[:] += jnp.sum(g, axis=0)
    d_hh = jnp.dot(gb, wo[:].T, preferred_element_type=F32)
    d_h = jnp.dot(gb, wd[:].T, preferred_element_type=F32)  # density path

    d_rgb_h = (d_hh[:, :HW] * (res["rgb_h"].astype(F32) > 0)).astype(dt)
    d_ins_h = (d_hh[:, HW:] * (res["ins_h"].astype(F32) > 0)).astype(dt)

    # ins hidden (branch stops at the trunk: no d_h contribution)
    dwih[:] += tn(res["ins_f"], d_ins_h)
    dbih[:] += jnp.sum(d_ins_h.astype(F32), axis=0)
    d_ins_f = jnp.dot(d_ins_h, wih[:].T, preferred_element_type=F32)

    # rgb hidden
    dwrh[:] += tn(res["rgb_cat"], d_rgb_h)
    dbrh[:] += jnp.sum(d_rgb_h.astype(F32), axis=0)
    d_rgb_cat = jnp.dot(d_rgb_h, wrh[:].T, preferred_element_type=F32)
    d_rgb_f = d_rgb_cat[:, :W]
    g_d = d_rgb_cat[:, W:]                                  # viewdir-enc cotangent

    # feat = h @ wf (+bf): grads for BOTH halves, trunk cotangent from rgb only
    d_feat = jnp.concatenate([d_rgb_f, d_ins_f], axis=-1).astype(dt)
    dwf[:] += tn(h, d_feat)
    dbf[:] += jnp.sum(d_feat.astype(F32), axis=0)
    d_h += jnp.dot(d_rgb_f.astype(dt), wf[:, :W].T, preferred_element_type=F32)

    # trunk, reverse
    gx = jnp.zeros((x.shape[0], x.shape[1]), F32)
    dh = d_h
    for i in range(D - 1, -1, -1):
        dy = (dh * (hs[i].astype(F32) > 0)).astype(dt)
        a_in = x if i == 0 else (
            jnp.concatenate([hs[cfg.skip], x], axis=-1) if i == cfg.skip + 1
            else hs[i - 1])
        dts[i][:] += tn(a_in, dy)
        dbt[i, :] += jnp.sum(dy.astype(F32), axis=0)
        d_full = jnp.dot(dy, t[i][:].T, preferred_element_type=F32)
        if i == cfg.skip + 1:
            dh = d_full[:, :W]
            gx += d_full[:, W:]
        elif i == 0:
            gx += d_full
        else:
            dh = d_full

    dx_ref[:] = gx.astype(dx_ref.dtype)
    dd_ref[:] = g_d.astype(dd_ref.dtype)


def _weight_idx(cfg: FieldConfig):
    D = cfg.netdepth
    return frozenset(list(range(D)) + [D + 1, D + 3, D + 5, D + 7, D + 8])


def _cast_packed(wb, cfg: FieldConfig):
    """Weight matrices to the compute dtype; biases/marker stay fp32."""
    widx = _weight_idx(cfg)
    dt = cfg.compute_dtype
    return tuple(w.astype(dt) if i in widx else w for i, w in enumerate(wb))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_field_packed(cfg: FieldConfig, enc_x, enc_d, *wb):
    """enc_x [P,XP], enc_d [P,DP] (compute dtype, P % tile == 0); wb fp32
    packed params (pack_params). Returns raw [P, 4+ins_num+1] fp32."""
    return _fwd_call(cfg, enc_x, enc_d, wb)


def _fwd_call(cfg, enc_x, enc_d, wb):
    n = enc_x.shape[0]
    tile = min(TILE_FWD, n)
    assert n % tile == 0, (n, tile)
    out_dim = 4 + cfg.ins_num + 1
    wb_c = _cast_packed(wb, cfg)
    bx = pl.BlockSpec((tile, enc_x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bd = pl.BlockSpec((tile, enc_d.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(n // tile,),
        in_specs=[bx, bd] + [full] * len(wb_c),
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), F32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(enc_x, enc_d, *wb_c)


def _fused_fwd(cfg, enc_x, enc_d, *wb):
    return _fwd_call(cfg, enc_x, enc_d, wb), (enc_x, enc_d, wb)


def _fused_bwd(cfg, residuals, g):
    enc_x, enc_d, wb = residuals
    n = enc_x.shape[0]
    tile_cap = TILE_BWD if cfg.compute_dtype == jnp.bfloat16 else TILE_BWD // 2
    tile = min(tile_cap, n)
    assert n % tile == 0, (n, tile)
    out_dim = 4 + cfg.ins_num + 1
    NP = _n_packed(cfg)
    wb_c = _cast_packed(wb, cfg)
    bx = pl.BlockSpec((tile, enc_x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bd = pl.BlockSpec((tile, enc_d.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bg = pl.BlockSpec((tile, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    # the marker (wb[-1]) gets no in-kernel accumulator; its grad is zeros
    out_shape = ([jax.ShapeDtypeStruct((n, enc_x.shape[1]), enc_x.dtype),
                  jax.ShapeDtypeStruct((n, enc_d.shape[1]), enc_d.dtype)]
                 + [jax.ShapeDtypeStruct(w.shape, F32) for w in wb[:NP - 1]])
    out_specs = [bx, bd] + [full] * (NP - 1)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(n // tile,),
        in_specs=[bx, bd] + [full] * len(wb_c) + [bg],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(enc_x, enc_d, *wb_c, g)
    dx, dd = outs[0], outs[1]
    return (dx, dd) + tuple(outs[2:]) + (jnp.zeros_like(wb[NP - 1]),)


fused_field_packed.defvjp(_fused_fwd, _fused_bwd)


def _pad_rows(arr, tile):
    n = arr.shape[0]
    pad = (-n) % tile
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], 0)
    return arr, pad


def make_field(cfg: FieldConfig, trainable: bool, mesh=None,
               axis_name: str = "data"):
    """field(params, pts [R,S,3], viewdirs [R,1,3]) -> raw [R,S,C] fp32.

    trainable=True routes through the custom-VJP (differentiable wrt params and
    pts/dirs); trainable=False uses the forward-only kernel (eval paths).

    mesh: under a device mesh the kernel runs inside shard_map over the point
    axis — the SPMD partitioner cannot see inside a tpu_custom_call, so without
    this each device would redundantly compute the full batch. Weights go in
    replicated (P()); shard_map's transpose turns their per-device cotangents
    into the gradient psum automatically.
    """
    n_shards = int(mesh.shape[axis_name]) if mesh is not None else 1
    # pad so every shard's rows are a multiple of both kernel tiles
    tile = TILE_FWD * n_shards

    def call(enc_x, enc_d, *wb):
        if trainable:
            return fused_field_packed(cfg, enc_x, enc_d, *wb)
        return _fwd_call(cfg, enc_x, enc_d, wb)

    def field(params, pts, viewdirs):
        R, S = pts.shape[:2]
        enc_x, enc_d = encode_inputs(pts, viewdirs, cfg, cfg.compute_dtype)
        enc_x, pad = _pad_rows(enc_x, tile)
        enc_d, _ = _pad_rows(enc_d, tile)
        wb = pack_params(params, cfg)
        if n_shards > 1 or (mesh is not None and _force_shard_map()):
            from jax.sharding import PartitionSpec as P
            fn = jax.shard_map(
                call, mesh=mesh,
                in_specs=(P(axis_name), P(axis_name)) + (P(),) * len(wb),
                out_specs=P(axis_name), check_vma=False)
            raw = fn(enc_x, enc_d, *wb)
        else:
            raw = call(enc_x, enc_d, *wb)
        if pad:
            raw = raw[:R * S]
        return raw.reshape(R, S, -1)

    return field


def make_pallas_field(cfg: FieldConfig, mesh=None):
    """Forward-only fused field for eval paths (former ops.pallas.fused_field
    entry): field(params, pts [R,S,3], viewdirs [R,1,3]) -> raw [R,S,C]."""
    return make_field(cfg, trainable=False, mesh=mesh)


def make_trainable_pallas_field(cfg: FieldConfig, mesh=None):
    """Custom-VJP fused field, drop-in for apply_field (former
    ops.pallas.fused_field_train entry). Differentiable wrt params/pts/dirs;
    under a mesh the shard_map transpose psums the weight cotangents."""
    return make_field(cfg, trainable=True, mesh=mesh)
