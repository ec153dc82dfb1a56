"""Render-time scene manipulation: inverse-query editing of a trained field.

Behavior parity with /root/reference/networks/manipulator.py:
- target rays = trans @ ori_pose rays: the edited object is rendered by querying
  the field along rays transformed by the object's inverse motion (:239-240).
- exchanger (:18-83): per-point label swap between the original and target ray
  raws with occlusion fixes (per-point argmax vs accumulated fine label),
  filling (accumulated says object but points don't), elimination (object seen
  on ori rays but not on tar rays -> zero the raw), exchange (tar rays see the
  object -> take tar raw).
- two-pass pipeline (:137-205): coarse fields on ori+tar rays, exchange, re-
  composite, importance-resample, fine pass on the sorted union of
  (ori 64, ori resampled 128, all tar importance 128*n_obj) z-values, exchange
  again, final composite.

TPU design: the whole per-chunk edit (≈ 4 + 2*n_obj field evaluations + sorts +
masked swaps) is one jitted function with static n_obj; masks are jnp.where
chains replicating the reference's in-place mutation order exactly.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from dmnerf_tpu.core.rendering import composite
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample


def _field_raw(field_fn, rays_o, rays_d, z_vals):
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return field_fn(pts, viewdirs[..., None, :])


def exchanger(ori_raw, tar_raws: Sequence[jnp.ndarray], ori_accum_ins,
              tar_accum_inss: Sequence[jnp.ndarray], move_labels: Sequence[int]):
    """Label-guided raw swap (manipulator.py:18-83).

    ori_raw: [N, S, C]; tar_raws[i]: [N, S, C];
    ori_accum_ins / tar_accum_inss[i]: [N, K+1] composited instance maps
    (sigmoid, air channel KEPT — the reference re-sigmoids and drops air for
    the argmax, which argmax-equals dropping air directly).
    """
    S = ori_raw.shape[1]
    # argmax(sigmoid(x)) == argmax(x): skip the [N,S,K] sigmoid the reference
    # applies before its argmaxes (manipulator.py:21,46) — identical labels
    ori_pred_label = jnp.argmax(ori_raw[..., 4:], axis=-1)                   # [N, S]
    ori_accum_label = jnp.argmax(ori_accum_ins[..., :-1], axis=-1)          # [N]
    ori_accum_label = jnp.broadcast_to(ori_accum_label[:, None], ori_pred_label.shape)

    out = ori_raw
    for idx, move_label in enumerate(move_labels):
        tar_raw = tar_raws[idx]
        tar_accum = tar_accum_inss[idx]

        # occlusion fix on ori: points claiming the object while the composited
        # ray label disagrees are reassigned to the ray label
        ori_is_move = ori_pred_label == move_label
        ori_occludes = (ori_accum_label != move_label) & ori_is_move
        ori_pred_label = jnp.where(ori_occludes, ori_accum_label, ori_pred_label)

        # filling: ray-level label says object, per-point labels don't
        fillings = (ori_pred_label != move_label) & (ori_accum_label == move_label)

        tar_pred_label = jnp.argmax(tar_raw[..., 4:], axis=-1)
        tar_accum_label = jnp.argmax(tar_accum[..., :-1], axis=-1)
        tar_accum_label = jnp.broadcast_to(tar_accum_label[:, None],
                                           tar_pred_label.shape)
        tar_occludes = (tar_accum_label != move_label) & (tar_pred_label == move_label)
        tar_pred_label = jnp.where(tar_occludes, tar_accum_label, tar_pred_label)

        # operation codes (manipulator.py:64-75): exchange wherever tar rays see
        # the object; eliminate where only ori rays see it; else keep
        ori_move = ori_pred_label == move_label
        tar_move = tar_pred_label == move_label
        exchange = tar_move | fillings
        eliminate = ori_move & (~tar_move)

        out = jnp.where(exchange[..., None], tar_raw, out)
        out = jnp.where(eliminate[..., None], jnp.zeros_like(out), out)
    return out


def manipulate_chunk(coarse_fn, fine_fn, ori_rays, tar_rays,
                     move_labels: Sequence[int], n_samples: int,
                     n_importance: int, near: float, far: float,
                     fine_accum_fn=None):
    """Edit one ray chunk. ori_rays: (o, d) each [N, 3]; tar_rays: list of
    (o, d) pairs, one per moved object. Returns (rgb [N,3], ins [N,K+1],
    tar_rgb [N,3], tar_ins [N,K+1]) — ins keeps the air channel
    (manipulator_render does not drop it; eval drops it before AP).

    fine_accum_fn(rays_o, rays_d, z_full) -> ins map [N, K+1] (air kept):
    optional fused field+composite path for the two fine "accumulated label"
    passes — their raws are never exchanged, only composited, so the fused
    kernel (ops/pallas/render_field) skips the [N,S,C] raw HBM round-trip.
    """
    ori_o, ori_d = ori_rays
    N = ori_o.shape[0]
    n_obj = len(tar_rays)

    ori_z = z_val_sample(N, near, far, n_samples)
    ori_raw = _field_raw(coarse_fn, ori_o, ori_d, ori_z)
    ori_w = composite(ori_raw, ori_z, ori_d, keep_air=True).weights
    ori_mid = 0.5 * (ori_z[..., 1:] + ori_z[..., :-1])

    # coarse fields + composites for all targets first, so the (1 + n_obj)
    # det inverse-CDF samplings batch into ONE sample_pdf call — its [N,S,B]
    # comparison intermediates are HBM-bound, so fewer/larger calls win
    # (measured ~0.3 ms/call at [512,128,63]; (1+n)x batching halves it/ray).
    # tar_z == ori_z (same det linspace, helpers.py:114-119).
    tar_raws, tar_rgbs = [], []
    for (tar_o, tar_d) in tar_rays:
        tar_raw = _field_raw(coarse_fn, tar_o, tar_d, ori_z)
        _c = composite(tar_raw, ori_z, tar_d, keep_air=True)
        tar_raws.append(tar_raw)
        tar_rgbs.append((_c.rgb, _c.weights))

    w_all = jnp.concatenate([ori_w[..., 1:-1]]
                            + [tw[..., 1:-1] for _, tw in tar_rgbs], axis=0)
    mid_all = jnp.broadcast_to(ori_mid[:1], (w_all.shape[0],) + ori_mid.shape[1:])
    zs_all = sample_pdf(mid_all, w_all, n_importance, det=True)
    ori_zs = zs_all[:N]
    tar_zs_list = [zs_all[(i + 1) * N:(i + 2) * N] for i in range(n_obj)]

    def _accum(o, d, z_full):
        if fine_accum_fn is not None:
            return fine_accum_fn(o, d, z_full)
        raw_full = _field_raw(fine_fn, o, d, z_full)
        return composite(raw_full, z_full, d, keep_air=True).ins

    ori_z_full = jnp.sort(jnp.concatenate([ori_z, ori_zs], -1), -1)
    ori_accum = _accum(ori_o, ori_d, ori_z_full)

    tar_accums = []
    tar_rgb = tar_ins_accum = None
    for i, (tar_o, tar_d) in enumerate(tar_rays):
        tar_z_full = jnp.sort(jnp.concatenate([ori_z, tar_zs_list[i]], -1), -1)
        t_accum = _accum(tar_o, tar_d, tar_z_full)
        tar_accums.append(t_accum)
        tar_rgb, tar_ins_accum = tar_rgbs[i][0], t_accum

    # pass 1: exchange coarse raws, re-composite, importance-resample
    ori_raw_x = exchanger(ori_raw, tar_raws, ori_accum, tar_accums, move_labels)
    w2 = composite(ori_raw_x, ori_z, ori_d, keep_air=True).weights
    ori_zs2 = sample_pdf(ori_mid, w2[..., 1:-1], n_importance, det=True)

    all_tar_zs = jnp.concatenate(tar_zs_list, -1)  # [N, n_imp * n_obj]
    ori_z2 = jnp.sort(jnp.concatenate([ori_z, ori_zs2, all_tar_zs], -1), -1)

    # pass 2: fine fields on the z union, exchange again, final composite.
    # The reference's per-object union sort(cat([tar_z, ori_zs2, all_tar_zs]))
    # (manipulator.py:196) uses the det coarse linspace tar_z == ori_z, so the
    # union IS ori_z2 — reuse it instead of re-sorting [N, 192+128*n_obj] per
    # object (and the reference recomputes the ori fine raw inside its object
    # loop, manipulator.py:194 — hoisted here, same result).
    ori_raw_f = _field_raw(fine_fn, ori_o, ori_d, ori_z2)
    tar_raws_f = [_field_raw(fine_fn, tar_o, tar_d, ori_z2)
                  for (tar_o, tar_d) in tar_rays]

    final_raw = exchanger(ori_raw_f, tar_raws_f, ori_accum, tar_accums, move_labels)
    _f = composite(final_raw, ori_z2, ori_d, keep_air=True)
    rgb, ins = _f.rgb, _f.ins
    return rgb, ins, tar_rgb, tar_ins_accum


import os as _os

EDIT_CHUNK = int(_os.environ.get("DMNERF_EDIT_CHUNK", 128))


def edit_chunk(args, n_obj: int = 1) -> int:
    """Ray-chunk size for whole-image edits: N_test capped at 128 (1 object)
    or 64 (2+ objects) when evenly divisible. The cap keeps the per-chunk
    [chunk, 64+128+128*n_obj, 37] f32 raws near VMEM size so XLA fuses the
    exchanger/composite consumers instead of round-tripping HBM — the working
    set doubles with the second object, so the optimal chunk halves.
    Measured on v5e (pallas field), device ms/image by chunk:
      128x128, 1 obj: {32: 265, 64: 264, 128: 261, 256: 283, 512: 296,
                       1024: 321, 2048: 339}
      640x480, 1 obj: {32: 4899, 128: 4851, 256: 5296, 512: 5572,
                       1024: 5887, 2048: 6214}
      640x480, 2 obj: {32: 8950, 64: 8947, 128: 9563}
    (the 640x480 rows are the round-5 reference-resolution sweep; see
    docs/DESIGN.md "Round-5"). N_test stays the memory upper bound."""
    cap = EDIT_CHUNK if n_obj <= 1 else max(EDIT_CHUNK // 2, 32)
    c = int(args.N_test)
    return cap if c > cap and c % cap == 0 else c


def _field_fns(cfg, params, use_pallas: bool, mesh=None):
    if use_pallas:
        from dmnerf_tpu.ops.pallas.field_kernels import make_pallas_field
        f = make_pallas_field(cfg, mesh=mesh)
        return (lambda pts, vd: f(params["coarse"], pts, vd),
                lambda pts, vd: f(params["fine"], pts, vd))
    from dmnerf_tpu.models.fields import apply_field
    return (lambda pts, vd: apply_field(params["coarse"], cfg, pts, vd),
            lambda pts, vd: apply_field(params["fine"], cfg, pts, vd))


def _fine_accum_fn(cfg, params, use_pallas: bool, mesh=None):
    """Fused field+composite for the fine accumulated-label passes (air kept),
    or None to take the raw+composite path."""
    if not use_pallas:
        return None
    from dmnerf_tpu.ops.pallas.render_field import make_render_field
    rf = make_render_field(cfg, heads="ins", mesh=mesh)

    def accum(rays_o, rays_d, z_full):
        pts = (rays_o[:, None, :]
               + rays_d[:, None, :] * z_full[:, :, None])
        return jax.nn.sigmoid(rf(params["fine"], pts, z_full, rays_d))

    return accum


def make_manipulator(cfg, params, args, n_obj: int, move_labels: List[int],
                     mesh=None, use_pallas: bool = False):
    """Jitted chunk editor with static chunk size args.N_test and n_obj.
    Under a device mesh the (original + per-object target) ray chunks shard
    over the 'data' axis — the edit is embarrassingly ray-parallel."""
    coarse_fn, fine_fn = _field_fns(cfg, params, use_pallas, mesh)
    accum_fn = _fine_accum_fn(cfg, params, use_pallas, mesh)

    @jax.jit
    def run(ori_o, ori_d, tar_os, tar_ds):
        if mesh is not None:
            from dmnerf_tpu.parallel.mesh import shard_batch
            ori_o, ori_d = shard_batch((ori_o, ori_d), mesh)
            tar_rays = [shard_batch((tar_os[i], tar_ds[i]), mesh)
                        for i in range(n_obj)]
        else:
            tar_rays = [(tar_os[i], tar_ds[i]) for i in range(n_obj)]
        return manipulate_chunk(coarse_fn, fine_fn, (ori_o, ori_d), tar_rays,
                                move_labels, args.N_samples, args.N_importance,
                                args.near, args.far, fine_accum_fn=accum_fn)

    return run


def _make_image_edit_core(cfg, params, args, n_obj: int,
                          move_labels: List[int], n_rays: int,
                          mesh=None, use_pallas: bool = False):
    """Traceable (unjitted) whole-image edit over padded ray arrays — the
    shared core of make_image_manipulator (host-built rays) and
    make_pose_image_manipulator (in-graph raygen from poses)."""
    chunk = edit_chunk(args, n_obj)
    assert n_rays % chunk == 0
    pack = bool(getattr(args, "d2h_pack", False))
    coarse_fn, fine_fn = _field_fns(cfg, params, use_pallas, mesh)
    accum_fn = _fine_accum_fn(cfg, params, use_pallas, mesh)

    def run_image(ori_o, ori_d, tar_os, tar_ds):
        def one(c):
            oo, od, tos, tds = c
            if mesh is not None:
                from dmnerf_tpu.parallel.mesh import shard_batch
                oo, od = shard_batch((oo, od), mesh)
                tar_rays = [shard_batch((tos[i], tds[i]), mesh)
                            for i in range(n_obj)]
            else:
                tar_rays = [(tos[i], tds[i]) for i in range(n_obj)]
            rgb, ins, _, _ = manipulate_chunk(
                coarse_fn, fine_fn, (oo, od), tar_rays, move_labels,
                args.N_samples, args.N_importance, args.near, args.far,
                fine_accum_fn=accum_fn)
            return (rgb, jnp.argmax(ins, -1).astype(jnp.int32),
                    jnp.argmax(ins[..., :-1], -1).astype(jnp.int32),
                    jnp.max(ins[..., :-1], -1))

        nc = n_rays // chunk
        parts = (ori_o.reshape(nc, chunk, 3), ori_d.reshape(nc, chunk, 3),
                 tar_os.reshape(n_obj, nc, chunk, 3).transpose(1, 0, 2, 3),
                 tar_ds.reshape(n_obj, nc, chunk, 3).transpose(1, 0, 2, 3))
        rgb, lab_full, lab, conf = jax.lax.map(one, parts)
        rgb, lab_full, lab, conf = (rgb.reshape(n_rays, 3),
                                    lab_full.reshape(n_rays),
                                    lab.reshape(n_rays), conf.reshape(n_rays))
        if pack:
            # device-side D2H packing (--d2h_pack): 24 -> 7 B/px over the
            # tunnel; runner._fetch_edit_image unpacks by dtype
            rgb = (255.0 * jnp.clip(rgb, 0, 1)).astype(jnp.uint8)
            lab_full = lab_full.astype(jnp.uint8)
            lab = lab.astype(jnp.uint8)
            conf = conf.astype(jnp.bfloat16)
        return rgb, lab_full, lab, conf

    return run_image


def make_image_manipulator(cfg, params, args, n_obj: int,
                           move_labels: List[int], n_rays: int,
                           mesh=None, use_pallas: bool = False):
    """Whole-image edit in ONE dispatch: lax.map over fixed-size chunks
    (same dispatch-amortization as eval.renderer.make_batch_renderer).
    n_rays must be a multiple of edit_chunk(args) (= args.N_test, capped at
    EDIT_CHUNK when evenly divisible) — callers pad via edit_chunk.

    Returns run_image(ori_o, ori_d, tar_os, tar_ds) ->
      (rgb [n,3], label_full [n] i32, label_noair [n] i32, conf_noair [n] f32)
    — the instance map is reduced ON DEVICE: the runners only consume
    argmax over all K+1 channels (visualization, manipulator.py:330) and
    argmax/max over the air-dropped channels (AP eval, manipulator.py:294);
    shipping the full [n, K+1] fp32 maps would be ~17x the D2H bytes over the
    tunnel."""
    return jax.jit(_make_image_edit_core(cfg, params, args, n_obj,
                                         move_labels, n_rays, mesh=mesh,
                                         use_pallas=use_pallas))


def make_pose_image_manipulator(cfg, params, args, objs, move_labels: List[int],
                                H: int, W: int, K, mesh=None,
                                use_pallas: bool = False):
    """Whole-image edit dispatched FROM POSES: ray generation (and padding)
    runs in-graph, so each view ships [1+n_obj, 4, 4] poses + [n_obj] deform
    scales host->device instead of 4 full [H*W, 3] ray arrays (at 640x480
    that is ~200 B vs ~15 MB per view; the axon tunnel is both
    latency- and bandwidth-bound on H2D).

    objs: static per-object specs — dicts with 'mode' ('rigid' | 'deform')
    and, for deform, 'deform_func' (edit/deform.py curves). The target rays of
    a rigid object come from get_rays(K, tar_pose); a deform object's come
    from the ori rays with the per-row curve (a compiled-in constant) times
    the per-view scale added to origin x (reference manipulator.py:397-429).

    Returns run(ori_pose [4,4], tar_poses [n_obj,4,4], dscales [n_obj]) with
    the same outputs/packing as make_image_manipulator (padded to n_rays;
    callers crop to H*W).

    Documented deviation: deform offsets (curve x scale) are computed in f32
    on device; the host-ray path computed them in f64 before casting. Drift
    is ~1e-7 per offset (test_manipulator.py bounds it at 2e-5 end-to-end) —
    the two paths are equal to tolerance, not bit-identical."""
    n_obj = len(objs)
    chunk = edit_chunk(args, n_obj)
    n = H * W
    n_pad = (-n) % chunk
    core = _make_image_edit_core(cfg, params, args, n_obj, move_labels,
                                 n + n_pad, mesh=mesh, use_pallas=use_pallas)
    from dmnerf_tpu.core.rays import get_rays
    from dmnerf_tpu.edit.deform import deform_curve

    K_const = jnp.asarray(K, jnp.float32)
    curves = [jnp.asarray(deform_curve(o["deform_func"], H, W), jnp.float32)
              if o["mode"] == "deform" else None for o in objs]

    def _pad(x):
        return jnp.pad(x, ((0, n_pad), (0, 0)), mode="edge") if n_pad else x

    @jax.jit
    def run(ori_pose, tar_poses, dscales):
        ro, rd = get_rays(H, W, K_const, ori_pose.astype(jnp.float32))
        ro, rd = _pad(ro.reshape(-1, 3)), _pad(rd.reshape(-1, 3))
        tar_os, tar_ds = [], []
        for i, obj in enumerate(objs):
            if obj["mode"] == "deform":
                off = _pad((curves[i] * dscales[i])[:, None] *
                           jnp.array([1.0, 0.0, 0.0]))
                to, td = ro + off, rd
            else:
                to, td = get_rays(H, W, K_const,
                                  tar_poses[i].astype(jnp.float32))
                to, td = _pad(to.reshape(-1, 3)), _pad(td.reshape(-1, 3))
            tar_os.append(to)
            tar_ds.append(td)
        return core(ro, rd, jnp.stack(tar_os), jnp.stack(tar_ds))

    return run
