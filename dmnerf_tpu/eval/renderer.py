"""Tiled full-image renderer.

The reference loops variable-size tail chunks (tester.py:63-77) which would
retrigger XLA compilation; here every chunk has the same static size (the ray
list is padded to a multiple of N_test and cropped after), so the chunk renderer
compiles exactly once. Under a device mesh each chunk is sharded over the ray
axis ('data').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.rays import get_rays
from dmnerf_tpu.core.rendering import render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.models.fields import FieldConfig, apply_field
from dmnerf_tpu.parallel.mesh import shard_batch

# fused-path eval chunk cap (rays); see make_image_renderer
FUSED_EVAL_CHUNK = 512


def make_chunk_renderer(cfg: FieldConfig, n_samples: int, n_importance: int,
                        near: float, far: float, chunk: int, mesh=None,
                        use_pallas: bool = False):
    """Returns render_chunk(params, rays_o[chunk,3], rays_d[chunk,3])
    -> (rgb [chunk,3], ins [chunk,K], depth [chunk])."""

    if use_pallas:
        from dmnerf_tpu.ops.pallas.field_kernels import make_pallas_field
        field = make_pallas_field(cfg, mesh=mesh)
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


def make_batch_renderer(cfg: FieldConfig, n_samples: int, n_importance: int,
                        near: float, far: float, chunk: int, n_rays: int,
                        mesh=None, use_pallas: bool = False, fused=None):
    """Whole-ray-set renderer in ONE dispatch: lax.map over fixed-size chunks.

    Per-chunk dispatch over the axon tunnel costs ~5 ms; a 640x480 image at
    N_test=4096 is 75 chunks = ~0.4 s of pure dispatch. This compiles the chunk
    loop into the program (sequential lax.map, so only one chunk's samples are
    live at a time) and dispatches once per image. n_rays must be a multiple of
    chunk (callers pad).

    fused (default: follow use_pallas): render each chunk with the fused
    field+composite kernels (ops/pallas/render_field) — raw [chunk,S,37]
    never touches HBM and the coarse pass is density-only (measured ~13
    ms/image of composite-stage HBM traffic removed at 128x128).
    """
    assert n_rays % chunk == 0
    if fused is None:
        fused = use_pallas

    if fused:
        from dmnerf_tpu.ops.pallas.render_field import make_fused_chunk_renderer
        render_chunk_fused = make_fused_chunk_renderer(cfg, n_importance,
                                                       mesh=mesh)

        @jax.jit
        def render_all_fused(params, rays_o, rays_d):
            if mesh is not None:
                rays_o, rays_d = shard_batch((rays_o, rays_d), mesh)
            z = z_val_sample(chunk, near, far, n_samples)

            def one(chunk_rays):
                ro, rd = chunk_rays
                return render_chunk_fused(params, ro, rd, z)

            ro = rays_o.reshape(-1, chunk, 3)
            rd = rays_d.reshape(-1, chunk, 3)
            rgb, ins, depth = jax.lax.map(one, (ro, rd))
            return (rgb.reshape(n_rays, 3), ins.reshape(n_rays, -1),
                    depth.reshape(n_rays))

        return render_all_fused

    if use_pallas:
        from dmnerf_tpu.ops.pallas.field_kernels import make_pallas_field
        field = make_pallas_field(cfg, mesh=mesh)
    else:
        field = lambda params, pts, vd: apply_field(params, cfg, pts, vd)

    @jax.jit
    def render_all(params, rays_o, rays_d):
        if mesh is not None:
            rays_o, rays_d = shard_batch((rays_o, rays_d), mesh)
        coarse_fn = lambda pts, vd: field(params["coarse"], pts, vd)
        fine_fn = lambda pts, vd: field(params["fine"], pts, vd)
        z = z_val_sample(chunk, near, far, n_samples)

        def one(chunk_rays):
            ro, rd = chunk_rays
            out = render_rays(coarse_fn, fine_fn, ro, rd, z, n_importance,
                              key=None, perturb=False)
            return out["rgb_fine"], out["ins_fine"], out["depth_fine"]

        ro = rays_o.reshape(-1, chunk, 3)
        rd = rays_d.reshape(-1, chunk, 3)
        rgb, ins, depth = jax.lax.map(one, (ro, rd))
        return (rgb.reshape(n_rays, 3), ins.reshape(n_rays, -1),
                depth.reshape(n_rays))

    return render_all


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


def make_image_renderer(cfg: FieldConfig, args, H: int, W: int, mesh=None,
                        use_pallas: bool = False, fused=None):
    """render_im(params, K, c2w) -> (rgb [H,W,3], label [H,W] i32,
    conf [H,W] f32, depth [H,W]) as numpy. ONE device dispatch per image: ray
    generation, padding, the chunked render, the instance argmax/max-prob
    reduction, and the crop/reshape all live inside one jit (unjitted ray-gen
    costs ~10 small dispatches x ~5 ms tunnel latency per image).

    --d2h_pack: the tunnel's D2H bandwidth is half the per-image wall clock
    (DESIGN.md); packing on device (rgb -> uint8 with the same truncation to8b
    applies anyway, label -> uint8, conf/depth -> bf16) cuts 24 B/px to 8 B/px.
    Outputs are unpacked host-side to the same dtypes/ranges, so consumers are
    unchanged; metrics then see 8-bit-quantized rgb (pngs are bit-identical,
    PSNR/SSIM/LPIPS shift at the ~0.01 dB level) — OFF by default so parity
    runs stay exact (tester.py computes metrics on f32)."""
    chunk = int(args.N_test)
    pack = bool(getattr(args, "d2h_pack", False))
    if fused is None:
        fused = use_pallas
    if fused:
        # measured on v5e (docs/DESIGN.md): the fused field+composite path is
        # fastest at small chunks (56 ms/image at <=512 rays/chunk vs 78 at
        # 4096) — the working set (PE streams + in-flight activations) stays
        # near VMEM scale. N_test is the reference's memory knob (an upper
        # bound), so shrinking the chunk is always legal.
        chunk = min(chunk, FUSED_EVAL_CHUNK)
    n = H * W
    n_pad = (-n) % chunk
    render_all = make_batch_renderer(cfg, args.N_samples, args.N_importance,
                                     args.near, args.far, chunk, n + n_pad,
                                     mesh=mesh, use_pallas=use_pallas,
                                     fused=fused)

    @jax.jit
    def render_im_dev(params, K, c2w):
        rays_o, rays_d = get_rays(H, W, K.astype(jnp.float32),
                                  c2w.astype(jnp.float32))
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        if n_pad:
            # edge-pad (repeat the last ray): works even when n_pad > n
            # (image smaller than one chunk); padded rows are cropped below
            rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)), mode="edge")
            rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)), mode="edge")
        rgb, ins, depth = render_all(params, rays_o, rays_d)
        # instance map reduced ON DEVICE: downstream (ins_eval, label->color
        # pngs) only consumes argmax + max-prob, and the full [H,W,K] fp32 map
        # costs ~10x the D2H bytes over the tunnel (evaluator.py:130-146)
        label = jnp.argmax(ins[:n], axis=-1).astype(jnp.int32)
        conf = jnp.max(ins[:n], axis=-1)
        rgb, label, conf, depth = (rgb[:n].reshape(H, W, 3),
                                   label.reshape(H, W), conf.reshape(H, W),
                                   depth[:n].reshape(H, W))
        if pack:
            rgb = (255.0 * jnp.clip(rgb, 0, 1)).astype(jnp.uint8)
            label = label.astype(jnp.uint8)     # ins_num <= 64 always
            conf = conf.astype(jnp.bfloat16)
            depth = depth.astype(jnp.bfloat16)
        return rgb, label, conf, depth

    def _unpack(out):
        rgb, label, conf, depth = (np.asarray(x) for x in jax.device_get(out))
        if pack:
            rgb = rgb.astype(np.float32) / 255.0
            label = label.astype(np.int32)
            conf = conf.astype(np.float32)
            depth = depth.astype(np.float32)
        return rgb, label, conf, depth

    def render_im(params, K, c2w):
        return _unpack(render_im_dev(params, jnp.asarray(K), jnp.asarray(c2w)))

    def render_many(params, K, c2ws):
        """Pipelined multi-view render: yields one (rgb, label, conf, depth)
        numpy tuple per pose, dispatching view i+1 BEFORE fetching view i so
        the ~55 ms/image D2H (tunnel-bandwidth-bound) overlaps the next
        image's device compute instead of serializing after it."""
        K = jnp.asarray(K)
        pending = None
        for c2w in c2ws:
            cur = render_im_dev(params, K, jnp.asarray(c2w))
            if pending is not None:
                yield _unpack(pending)
            pending = cur
        if pending is not None:
            yield _unpack(pending)

    render_im.many = render_many
    return render_im
