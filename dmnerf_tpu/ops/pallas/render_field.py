"""Fused field+composite Pallas kernel for the eval render path.

Motivation (measured, v5e, 128x128 image = 16384 rays, chunk 4096): the
two-stage eval pipeline (field kernel -> raw [R,S,37] f32 in HBM -> XLA
alpha-composite) spends ~13 ms/image on the composite stage, almost all of it
raw-tensor HBM traffic (the fine raw alone is 466 MB/image written once and
read back per composited output). This kernel composites INSIDE the field
kernel while the raw tile is still VMEM-resident, so raw never touches HBM:
per ray-tile it runs the trunk+heads (ops/pallas/field_kernels._fwd_body) and
reduces straight to the per-RAY outputs (rgb [R,3], depth [R], instance
logits [R,K+1], weights [R,S]) — a ~37x smaller write.

Composite parity: /root/reference/networks/render.py:6-28 (render_train);
same math as core.rendering.composite. The exclusive cumprod transmittance is
computed as exp(log(1-alpha+1e-10) @ strict_lower_triangular_ones) — a [S,S]
MXU matmul instead of a lane-axis cumprod (which Mosaic lowers poorly);
equivalence is exact up to f32 exp/log rounding (tested).

Eval-only specializations:
- `heads="sigma"`: the coarse pass at eval exists only to produce the
  importance-sampling weights (render.py:66-68), which depend on sigma alone —
  this variant skips the rgb/ins head matmuls and the viewdir encoding
  entirely and emits just weights [R,S].
- no stop_gradient bookkeeping: this path is forward-only (the train step
  keeps the custom-VJP field kernel + XLA composite, where raw traffic is
  only ~0.4 ms at R=3072).

Used by eval.renderer when use_pallas is on; the manipulator keeps the raw
path (its exchanger edits raw samples before compositing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.ops.pallas.field_kernels import (
    TILE_FWD, _VMEM_LIMIT, _cast_packed, _fwd_body, _interpret, _ru,
    encode_inputs, encode_pos, pack_params)

F32 = jnp.float32


def _density_body(cfg: FieldConfig, x, wb):
    """Trunk + density head only. x [T,XP]. Returns rawd [T,C] (sigma at
    lane 3, other lanes garbage-but-cheap: wd's non-density columns are 0)."""
    D = cfg.netdepth
    t, bt = wb[0:D], wb[D]
    wd, bo = wb[D + 8], wb[D + 9]

    def mm(a, w):
        return jnp.dot(a, w[:], preferred_element_type=F32)

    dt = cfg.compute_dtype
    a = x
    h = x
    for i in range(D):
        h = jnp.maximum(mm(a, t[i]) + bt[i], 0.0).astype(dt)
        a = jnp.concatenate([h, x], axis=-1) if i == cfg.skip else h
    return mm(h, wd) + bo[:]


def _ins_body(cfg: FieldConfig, x, wb):
    """Trunk + density + instance branch only (no rgb head, no viewdirs).
    x [T,XP]. Returns raw [T,C] with col 3 = sigma and cols 4: = ins logits
    (cols 0:3 are rgb biases — garbage, never read). Saves the rgb half of wf,
    the whole wrh matmul, and the viewdir encoding vs _fwd_body — ~15% of the
    per-point MACs — for consumers that only composite the instance map."""
    D, W = cfg.netdepth, cfg.netwidth
    t, bt = wb[0:D], wb[D]
    wf, bf = wb[D + 1], wb[D + 2]
    wih, bih = wb[D + 5], wb[D + 6]
    wo, wd, bo = wb[D + 7], wb[D + 8], wb[D + 9]

    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=F32)

    dt = cfg.compute_dtype
    a = x
    h = x
    for i in range(D):
        h = jnp.maximum(mm(a, t[i][:]) + bt[i], 0.0).astype(dt)
        a = jnp.concatenate([h, x], axis=-1) if i == cfg.skip else h

    ins_f = (mm(h, wf[:, W:]) + bf[W:]).astype(dt)
    ins_h = jnp.maximum(mm(ins_f, wih[:]) + bih[:], 0.0).astype(dt)
    # wo rows W//2:W carry ins_out into cols 4:C (pack_params); wd col 3 = sigma
    return mm(ins_h, wo[W // 2:W]) + mm(h, wd[:]) + bo[:]


def _transmittance(alpha):
    """Exclusive cumprod of (1 - alpha + 1e-10) along the sample axis via a
    strict-lower-triangular [S,S] ones matmul in log space.

    The factor is clamped (max(1-alpha, 1e-10)) rather than the reference's
    +1e-10: compilers that reassociate fp adds (XLA CPU fast-math) fold the
    epsilon away, and log(0) = -inf turns into NaN at the -inf * 0 entries of
    the triangular matmul. The two forms differ by <=1e-10 on a weight that is
    itself <=1.5e-10 — invisible at f32."""
    S = alpha.shape[-1]
    logs = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    lt = (j < i).astype(F32)
    return jnp.exp(jnp.dot(logs, lt, preferred_element_type=F32))


def _weights_from(rawd3, dists):
    alpha = 1.0 - jnp.exp(-jnp.maximum(rawd3[:, :, 3], 0.0) * dists)
    return alpha * _transmittance(alpha)


def _composite_kernel(cfg, tr, s, heads, outw, x_ref, d_ref, z_ref, dists_ref,
                      *refs):
    out_ref = refs[-1]
    wb = refs[:-1]
    dists = dists_ref[:]    # [TR, S]

    if heads == "sigma":
        rawd = _density_body(cfg, x_ref[:], wb)          # [TR*S, C]
        weights = _weights_from(rawd.reshape(tr, s, rawd.shape[-1]), dists)
        out_ref[:] = jnp.pad(weights, ((0, 0), (0, outw - s)))
        return

    if heads == "ins":
        raw = _ins_body(cfg, x_ref[:], wb)               # [TR*S, C]
        C = raw.shape[-1]
        raw3 = raw.reshape(tr, s, C)
        weights = _weights_from(raw3, dists)
        ins_logits = jnp.sum(weights[:, :, None] * raw3[:, :, 4:], axis=1)
        out_ref[:] = jnp.pad(ins_logits, ((0, 0), (0, outw - C + 4)))
        return

    raw, _ = _fwd_body(cfg, x_ref[:], d_ref[:], wb)      # [TR*S, C] f32
    C = raw.shape[-1]
    raw3 = raw.reshape(tr, s, C)
    weights = _weights_from(raw3, dists)                 # [TR, S]

    rgb = jax.nn.sigmoid(raw3[:, :, 0:3])
    rgb_map = jnp.sum(weights[:, :, None] * rgb, axis=1)            # [TR, 3]
    depth = jnp.sum(weights * z_ref[:], axis=1)                     # [TR]
    ins_logits = jnp.sum(weights[:, :, None] * raw3[:, :, 4:], axis=1)

    vals = jnp.concatenate([rgb_map, depth[:, None], ins_logits], axis=-1)
    out_ref[:] = jnp.pad(vals, ((0, 0), (0, outw - vals.shape[-1])))


def _tile_rays(n_rays: int, s: int) -> int:
    """Ray-tile size: ~TILE_FWD points per grid step, sublane-friendly.

    Mosaic requires the [tr, s] z/dists/out blocks' sublane dim be a MULTIPLE
    of 8 (or equal to the whole axis) — merely >=8 still fails lowering
    (observed: tr=26 at n=104, s=48 on hardware). pad_rays pads every entry
    point to a multiple of 8, so the step-8 walk below always terminates at a
    legal tr (8 divides n_rays); the assert guards the invariant."""
    assert n_rays % 8 == 0, f"ray axis must be padded to 8 (got {n_rays})"
    tr = max(8, TILE_FWD // s)
    tr -= tr % 8
    tr = min(tr, n_rays)
    while n_rays % tr:
        tr -= 8
    return tr


def _make_call(cfg: FieldConfig, heads: str):
    C = 4 + cfg.ins_num + 1

    def call(enc_x, enc_d, z, dists, *wb):
        n, s = z.shape
        tr = _tile_rays(n, s)
        outw = _ru(s if heads == "sigma" else (C - 4 if heads == "ins" else C),
                   128)
        wb_c = _cast_packed(wb, cfg)
        bx = pl.BlockSpec((tr * s, enc_x.shape[1]), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        if heads in ("sigma", "ins"):
            # dummy dirs: one constant block, never read
            bd = pl.BlockSpec((enc_d.shape[0], enc_d.shape[1]),
                              lambda i: (0, 0), memory_space=pltpu.VMEM)
        else:
            bd = pl.BlockSpec((tr * s, enc_d.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        bz = pl.BlockSpec((tr, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_composite_kernel, cfg, tr, s, heads, outw),
            grid=(n // tr,),
            in_specs=[bx, bd, bz, bz] + [full] * len(wb_c),
            out_specs=pl.BlockSpec((tr, outw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, outw), F32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(enc_x, enc_d, z, dists, *wb_c)

    return call


def _dists(z, rays_d):
    """Per-sample distances (render.py:7-9), computed XLA-side ([R,S] f32 is
    tiny next to the raw tensor the fusion removes)."""
    dn = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1) * dn


def make_render_field(cfg: FieldConfig, heads: str = "all", mesh=None,
                      axis_name: str = "data"):
    """Build the fused field+composite eval renderer for one field.

    heads="all":   rf(params, pts [R,S,3], viewdirs [R,1,3], z [R,S],
                   rays_d [R,3]) -> (rgb [R,3], depth [R], ins_logits [R,K+1])
    heads="sigma": rf(params, pts, z, rays_d) -> weights [R,S]
                   (coarse pass: importance weights only; no viewdirs)
    heads="ins":   rf(params, pts, z, rays_d) -> ins_logits [R,K+1]
                   (manipulator accum passes: instance map only; no viewdirs,
                   no rgb branch — ~15% fewer MACs/point than "all")

    Under a mesh the kernel shard_maps over the ray axis (weights replicated);
    ray counts not divisible by the mesh axis are zero-padded (padded rays
    composite to zeros and are cropped), matching field_kernels.make_field's
    tolerance of arbitrary row counts.
    """
    assert heads in ("all", "sigma", "ins")
    n_shards = int(mesh.shape[axis_name]) if mesh is not None else 1
    dt = cfg.compute_dtype
    call = _make_call(cfg, heads)

    def pad_rays(pts, viewdirs, z, rays_d):
        """Zero-pad the ray axis so every shard sees a multiple of 8 rays
        (the Mosaic sublane floor _tile_rays relies on; previously a sub-512
        non-multiple-of-8 chunk like --N_test 100 could tile below 8)."""
        n = z.shape[0]
        p = (-n) % (8 * n_shards)
        if not p:
            return pts, viewdirs, z, rays_d
        zer = lambda a: jnp.concatenate(
            [a, jnp.zeros((p,) + a.shape[1:], a.dtype)], axis=0)
        if viewdirs is not None:
            viewdirs = zer(viewdirs)
        # rays_d pads to ones: only its norm is used (dists scale). Padded
        # rows are garbage-but-cropped — the appended 1e10 final dist gives
        # the padded ray's last sample alpha~1 — callers slice out[:n] before
        # any reduction, so nothing downstream may consume padded rows.
        rays_d = jnp.concatenate(
            [rays_d, jnp.ones((p, 3), rays_d.dtype)], axis=0)
        return zer(pts), viewdirs, zer(z), rays_d

    def run(enc_x, enc_d, z, dists, wb, dirs_replicated):
        from dmnerf_tpu.ops.pallas.field_kernels import _force_shard_map
        if n_shards > 1 or (mesh is not None and _force_shard_map()):
            from jax.sharding import PartitionSpec as P
            d_spec = P() if dirs_replicated else P(axis_name)
            fn = jax.shard_map(
                call, mesh=mesh,
                in_specs=(P(axis_name), d_spec, P(axis_name), P(axis_name))
                + (P(),) * len(wb),
                out_specs=P(axis_name), check_vma=False)
            return fn(enc_x, enc_d, z, dists, *wb)
        return call(enc_x, enc_d, z, dists, *wb)

    if heads in ("sigma", "ins"):
        def rf(params, pts, z, rays_d):
            n, s = z.shape
            pts, _, z, rays_d = pad_rays(pts, None, z, rays_d)
            enc_x = encode_pos(pts.reshape(z.shape[0] * s, 3), cfg, dt)
            enc_d = jnp.zeros((8, 128), dt)
            wb = pack_params(params, cfg)
            out = run(enc_x, enc_d, z, _dists(z, rays_d), wb, True)
            return out[:n, :s] if heads == "sigma" \
                else out[:n, :cfg.ins_num + 1]
        return rf

    def rf(params, pts, viewdirs, z, rays_d):
        n = z.shape[0]
        pts, viewdirs, z, rays_d = pad_rays(pts, viewdirs, z, rays_d)
        enc_x, enc_d = encode_inputs(pts, viewdirs, cfg, dt)
        wb = pack_params(params, cfg)
        out = run(enc_x, enc_d, z, _dists(z, rays_d), wb, False)
        return out[:n, 0:3], out[:n, 3], out[:n, 4:4 + cfg.ins_num + 1]

    return rf


def make_fused_chunk_renderer(cfg: FieldConfig, n_importance: int, mesh=None):
    """render_chunk(params, rays_o, rays_d, z_vals_coarse)
    -> (rgb [R,3], ins [R,K] sigmoid/air-dropped, depth [R]).

    The eval coarse->fine pipeline (render_rays with key=None/perturb=False)
    with both field evaluations fused with their composites; matches the
    outputs eval consumes to f32 exp/log rounding.
    """
    from dmnerf_tpu.core.sampling import sample_pdf

    coarse_rf = make_render_field(cfg, heads="sigma", mesh=mesh)
    fine_rf = make_render_field(cfg, heads="all", mesh=mesh)

    def render_chunk(params, rays_o, rays_d, z_vals_coarse):
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        pts_c = (rays_o[:, None, :]
                 + rays_d[:, None, :] * z_vals_coarse[:, :, None])
        w_c = coarse_rf(params["coarse"], pts_c, z_vals_coarse, rays_d)

        z_mid = 0.5 * (z_vals_coarse[:, 1:] + z_vals_coarse[:, :-1])
        z_samples = sample_pdf(z_mid, w_c[:, 1:-1], n_importance,
                               key=None, det=True)
        z_fine = jnp.sort(jnp.concatenate([z_vals_coarse, z_samples], axis=-1),
                          axis=-1)

        pts_f = rays_o[:, None, :] + rays_d[:, None, :] * z_fine[:, :, None]
        rgb, depth, ins_logits = fine_rf(params["fine"], pts_f,
                                         viewdirs[:, None, :], z_fine, rays_d)
        ins = jax.nn.sigmoid(ins_logits)[:, :-1]
        return rgb, ins, depth

    return render_chunk
