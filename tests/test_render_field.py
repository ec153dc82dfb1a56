"""Fused field+composite eval kernel vs the XLA render_rays path
(interpret mode on CPU)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.rendering import render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.models.fields import FieldConfig, apply_field, init_field_params
from dmnerf_tpu.ops.pallas.render_field import (make_fused_chunk_renderer,
                                                make_render_field)

CFG = FieldConfig(netdepth=3, netwidth=32, multires=4, multires_views=2,
                  ins_num=4, skip=1, compute_dtype=jnp.float32)


def _scene(R=8, S=6):
    rng = np.random.default_rng(3)
    rays_o = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32) * 0.1)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    rays_d = jnp.asarray(rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
                         * rng.uniform(0.8, 1.2, size=(R, 1)).astype(np.float32))
    z = z_val_sample(R, 1.0, 6.0, S)
    params = {"coarse": init_field_params(jax.random.PRNGKey(0), CFG),
              "fine": init_field_params(jax.random.PRNGKey(1), CFG)}
    return rays_o, rays_d, z, params


@pytest.mark.slow
def test_fused_chunk_matches_render_rays():
    rays_o, rays_d, z, params = _scene()
    coarse_fn = lambda pts, vd: apply_field(params["coarse"], CFG, pts, vd)
    fine_fn = lambda pts, vd: apply_field(params["fine"], CFG, pts, vd)
    want = render_rays(coarse_fn, fine_fn, rays_o, rays_d, z, 4,
                       key=None, perturb=False)

    rc = make_fused_chunk_renderer(CFG, 4)
    rgb, ins, depth = rc(params, rays_o, rays_d, z)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(want["rgb_fine"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ins), np.asarray(want["ins_fine"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want["depth_fine"]),
                               atol=1e-3, rtol=1e-4)


def test_sigma_weights_match_composite():
    from dmnerf_tpu.core.rendering import composite, eval_field
    rays_o, rays_d, z, params = _scene(R=16, S=8)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    raw = eval_field(lambda p, v: apply_field(params["coarse"], CFG, p, v),
                     rays_o, rays_d, vd, z)
    want = composite(raw, z, rays_d).weights

    rf = make_render_field(CFG, heads="sigma")
    got = rf(params["coarse"], pts, z, rays_d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_ins_heads_match_composite():
    """heads='ins' (manipulator accum passes) == XLA field + composite .ins
    with the air channel kept."""
    from dmnerf_tpu.core.rendering import composite, eval_field
    rays_o, rays_d, z, params = _scene(R=16, S=8)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    raw = eval_field(lambda p, v: apply_field(params["fine"], CFG, p, v),
                     rays_o, rays_d, vd, z)
    want = composite(raw, z, rays_d, keep_air=True).ins

    rf = make_render_field(CFG, heads="ins")
    got = jax.nn.sigmoid(rf(params["fine"], pts, z, rays_d))
    assert got.shape == (16, CFG.ins_num + 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_image_renderer_fused_matches_unfused():
    """make_image_renderer(fused) == the XLA chunked path, single + sharded."""
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.parallel.mesh import make_mesh
    from dmnerf_tpu.train.step import create_train_state

    scene = make_scene(H=8, W=8, n_train=1, n_test=1)
    args = default_config(N_test=32, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4,
                          multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    ref = make_image_renderer(cfg, args, 8, 8, fused=False)(
        state.params, scene.K, scene.poses[scene.i_test[0]])

    # tolerance note: the fused transmittance's exp/log rounding (~1e-7 rel)
    # can nudge an inverse-CDF importance sample across a bin boundary, moving
    # a few pixels by ~1e-3 — bounded and quality-invisible.
    for mesh in (None, make_mesh()):
        got = make_image_renderer(cfg, args, 8, 8, mesh=mesh, fused=True)(
            state.params, scene.K, scene.poses[scene.i_test[0]])
        for g, w, tol in zip(got, ref, (5e-3, 0, 5e-3, 5e-2)):
            np.testing.assert_allclose(g, w, atol=tol, rtol=6e-3)


def test_mesh_label_fn_fused_matches_xla():
    """Vertex-coloring labels: fused chunk renderer vs the raw XLA path."""
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.mesh.extract import make_label_fn
    from dmnerf_tpu.train.step import create_train_state

    args = default_config(N_test=16, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4,
                          multires_views=2)
    args.ins_num = 4
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(5)
    rays_o = rng.normal(size=(40, 3)).astype(np.float32) * 0.2
    rays_d = rng.normal(size=(40, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    ref = make_label_fn(cfg, args, args.N_test, use_fused=False)(
        state.params, rays_o, rays_d)
    got = make_label_fn(cfg, args, args.N_test, use_fused=True)(
        state.params, rays_o, rays_d)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_fused_chunk_indivisible_by_mesh():
    """Ray counts not divisible by the mesh axis must render (zero-padded),
    matching the unfused path's tolerance (regression: shard_map divisibility
    crash at chunk % n_devices != 0)."""
    from dmnerf_tpu.parallel.mesh import make_mesh

    rays_o, rays_d, z, params = _scene(R=12, S=6)  # 12 % 8 != 0
    coarse_fn = lambda pts, vd: apply_field(params["coarse"], CFG, pts, vd)
    fine_fn = lambda pts, vd: apply_field(params["fine"], CFG, pts, vd)
    want = render_rays(coarse_fn, fine_fn, rays_o, rays_d, z, 4,
                       key=None, perturb=False)

    rc = make_fused_chunk_renderer(CFG, 4, mesh=make_mesh())
    rgb, ins, depth = rc(params, rays_o, rays_d, z)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(want["rgb_fine"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want["depth_fine"]),
                               atol=1e-3, rtol=1e-4)


def test_image_renderer_fused_chunk_cap():
    """N_test > 512 activates the fused chunk cap; result matches unfused."""
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.eval.renderer import make_image_renderer

    scene = make_scene(H=24, W=24, n_train=1, n_test=1)  # 576 rays > 512 cap
    args = default_config(N_test=4096, N_samples=4, N_importance=4,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=16, multires=2,
                          multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    params = {"coarse": init_field_params(jax.random.PRNGKey(0), cfg),
              "fine": init_field_params(jax.random.PRNGKey(1), cfg)}

    ref = make_image_renderer(cfg, args, 24, 24, fused=False)(
        params, scene.K, scene.poses[scene.i_test[0]])
    got = make_image_renderer(cfg, args, 24, 24, fused=True)(
        params, scene.K, scene.poses[scene.i_test[0]])
    for g, w, tol in zip(got, ref, (5e-3, 0, 5e-3, 5e-2)):
        np.testing.assert_allclose(g, w, atol=tol, rtol=6e-3)


def test_tile_rays_floor_and_divisibility():
    from dmnerf_tpu.ops.pallas.render_field import _tile_rays

    assert _tile_rays(512, 192) >= 8            # Mosaic sublane floor
    # pad_rays guarantees 8 | n_rays at every entry point; tr must then be a
    # MULTIPLE of 8 (Mosaic block constraint — tr=26 at (104,48) crashed on
    # hardware) that divides n
    for n, s in [(512, 192), (512, 64), (4096, 256), (576, 192), (16, 6),
                 (104, 192), (104, 48), (296, 192), (504, 192), (8, 320)]:
        tr = _tile_rays(n, s)
        assert n % tr == 0 and 8 <= tr <= n and tr % 8 == 0
    with pytest.raises(AssertionError):
        _tile_rays(100, 192)  # unpadded ray count must be rejected, not mis-tiled


def test_image_renderer_fused_2d_mesh():
    """Fused eval under a 2-D (data, model) mesh: rays shard over 'data',
    kernel weights replicated over 'model'; must match the single-device XLA
    path."""
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.parallel.mesh import make_mesh_2d
    from dmnerf_tpu.train.step import create_train_state

    scene = make_scene(H=8, W=8, n_train=1, n_test=1)
    args = default_config(N_test=32, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4,
                          multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    ref = make_image_renderer(cfg, args, 8, 8, fused=False)(
        state.params, scene.K, scene.poses[scene.i_test[0]])
    got = make_image_renderer(cfg, args, 8, 8, mesh=make_mesh_2d(4, 2),
                              fused=True)(
        state.params, scene.K, scene.poses[scene.i_test[0]])
    for g, w, tol in zip(got, ref, (5e-3, 0, 5e-3, 5e-2)):
        np.testing.assert_allclose(g, w, atol=tol, rtol=6e-3)


def test_image_renderer_d2h_pack_roundtrip():
    """--d2h_pack returns the same interface (f32 rgb etc.) with rgb quantized
    to 8-bit; labels identical, conf within bf16 rounding."""
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.train.step import create_train_state

    scene = make_scene(H=8, W=8, n_train=1, n_test=1)
    args = default_config(N_test=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4,
                          multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    ref = make_image_renderer(cfg, args, 8, 8)(
        state.params, scene.K, scene.poses[scene.i_test[0]])
    args.d2h_pack = True
    got = make_image_renderer(cfg, args, 8, 8)(
        state.params, scene.K, scene.poses[scene.i_test[0]])

    assert got[0].dtype == np.float32 and got[1].dtype == np.int32
    np.testing.assert_allclose(got[0], ref[0], atol=1.01 / 255)
    np.testing.assert_array_equal(got[1], ref[1])
    np.testing.assert_allclose(got[2], ref[2], atol=1 / 128)  # bf16 mantissa
    # pngs must be bit-identical: to8b(unpacked) == to8b(f32)
    from dmnerf_tpu.utils.viz import to8b
    np.testing.assert_array_equal(to8b(got[0]), to8b(ref[0]))

    # the pipelined multi-view path (bench.py's packed-render measurement)
    # must unpack identically to the single-image call
    poses = np.stack([scene.poses[scene.i_test[0]]] * 2)
    for many_out in make_image_renderer(cfg, args, 8, 8).many(
            state.params, scene.K, poses):
        for m, g in zip(many_out, got):
            np.testing.assert_array_equal(m, g)
