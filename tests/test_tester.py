"""Integration: full-image chunked render + metrics + artifacts (CPU, tiny)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.config import default_config
from dmnerf_tpu.data.synthetic import make_scene
from dmnerf_tpu.eval.renderer import make_chunk_renderer, render_image
from dmnerf_tpu.eval.tester import render_test
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.step import create_train_state


def test_render_test_writes_artifacts(tmp_path):
    scene = make_scene(H=16, W=16, n_train=2, n_test=2)
    args = default_config(N_test=256, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    render_chunk = make_chunk_renderer(cfg, args.N_samples, args.N_importance,
                                       args.near, args.far, args.N_test)
    sel = scene.i_test
    out = render_test(render_chunk, state.params, scene.poses[sel], scene.hwk,
                      args, gt_imgs=scene.images[sel],
                      gt_labels=scene.gt_labels[sel], ins_rgbs=scene.ins_rgbs,
                      savedir=str(tmp_path))
    psnr, ssim, lpips, ap = out
    assert np.isfinite(psnr) and np.isfinite(ssim)
    assert np.isnan(lpips)  # gated: no weights in this environment
    assert len(ap) == 6

    table = np.loadtxt(os.path.join(tmp_path, "test_results.txt"))
    assert table.shape == (3, 9)  # 2 views + mean row, 9 columns
    assert os.path.exists(os.path.join(tmp_path, "matching_log.json"))
    assert os.path.exists(os.path.join(tmp_path, "000.png"))
    assert os.path.exists(os.path.join(tmp_path, "instance_000.png"))


def test_render_image_padding():
    """H*W not divisible by chunk -> padded tiles, exact-size output."""
    scene = make_scene(H=10, W=14, n_train=1, n_test=1)
    args = default_config(N_samples=8, N_importance=8, near=1.0, far=12.0,
                          precision="f32", netdepth=2, netwidth=32,
                          multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    chunk = 64  # 140 rays -> 3 chunks with padding
    render_chunk = make_chunk_renderer(cfg, args.N_samples, args.N_importance,
                                       args.near, args.far, chunk)
    rgb, ins, depth = render_image(render_chunk, state.params, 10, 14,
                                   scene.K, scene.poses[0], chunk)
    assert rgb.shape == (10, 14, 3)
    assert ins.shape == (10, 14, scene.ins_num)
    assert depth.shape == (10, 14)
    assert np.isfinite(rgb).all()


def test_image_renderer_matches_chunked():
    """Single-dispatch lax.map renderer == legacy per-chunk renderer."""
    from dmnerf_tpu.eval.renderer import make_image_renderer

    scene = make_scene(H=10, W=12, n_train=1, n_test=1)
    args = default_config(N_test=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(3), cfg)

    render_chunk = make_chunk_renderer(cfg, args.N_samples, args.N_importance,
                                       args.near, args.far, args.N_test)
    rgb1, ins1, d1 = render_image(render_chunk, state.params, 10, 12,
                                  scene.K, scene.poses[0], args.N_test)
    render_im = make_image_renderer(cfg, args, 10, 12)
    rgb2, label2, conf2, d2 = render_im(state.params, scene.K, scene.poses[0])
    np.testing.assert_allclose(rgb1, rgb2, atol=1e-5)
    np.testing.assert_array_equal(np.argmax(ins1, -1), label2)
    np.testing.assert_allclose(ins1.max(-1), conf2, atol=1e-5)
    np.testing.assert_allclose(d1, d2, atol=1e-4)


def test_render_many_matches_sync():
    """Pipelined multi-view generator == per-image synchronous renders,
    including ordering (it dispatches ahead but must yield in pose order)."""
    from dmnerf_tpu.eval.renderer import make_image_renderer

    scene = make_scene(H=10, W=12, n_train=2, n_test=3)
    args = default_config(N_test=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(3), cfg)
    render_im = make_image_renderer(cfg, args, 10, 12)

    poses = np.asarray(scene.poses[scene.i_test])
    sync = [render_im(state.params, scene.K, p) for p in poses]
    piped = list(render_im.many(state.params, scene.K, poses))
    assert len(piped) == len(sync)
    for s, p in zip(sync, piped):
        for a, b in zip(s, p):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_renderer_sharded():
    """Whole-image renderer with the ray axis sharded over 8 virtual devices."""
    import jax as _jax
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.parallel.mesh import make_mesh

    assert len(_jax.devices()) == 8
    scene = make_scene(H=8, W=8, n_train=1, n_test=1)
    args = default_config(N_test=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    render_im = make_image_renderer(cfg, args, 8, 8, mesh=mesh)
    rgb_m, lab_m, conf_m, _ = render_im(state.params, scene.K, scene.poses[0])
    render_im1 = make_image_renderer(cfg, args, 8, 8)
    rgb_1, lab_1, conf_1, _ = render_im1(state.params, scene.K, scene.poses[0])
    np.testing.assert_allclose(rgb_m, rgb_1, atol=1e-5)
    np.testing.assert_array_equal(lab_m, lab_1)
    np.testing.assert_allclose(conf_m, conf_1, atol=1e-5)


def test_render_test_crop_path(tmp_path):
    """ScanNet-style center-crop metrics path (tester.py:25-40,78-82):
    render/gt cropped, out-of-crop pred masked, unlabeled=ins_num in gt."""
    import os

    scene = make_scene(H=16, W=16, n_train=1, n_test=2)
    args = default_config(N_test=256, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2,
                          crop_width=12, crop_height=10)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    from dmnerf_tpu.data.scannet import crop_data
    crop_mask = crop_data(16, 16, [12, 10])
    # scannet-style labels: some unlabeled pixels marked ins_num
    labels = scene.gt_labels.copy()
    labels[:, ::5, ::3] = scene.ins_num

    render_chunk = make_chunk_renderer(cfg, args.N_samples, args.N_importance,
                                       args.near, args.far, args.N_test)
    sel = scene.i_test
    out = render_test(render_chunk, state.params, scene.poses[sel], scene.hwk,
                      args, gt_imgs=scene.images[sel], gt_labels=labels[sel],
                      ins_rgbs=scene.ins_rgbs, savedir=str(tmp_path),
                      crop_mask=crop_mask)
    psnr, ssim, _, ap = out
    assert np.isfinite(psnr) and np.isfinite(ssim)
    table = np.loadtxt(os.path.join(tmp_path, "test_results.txt"))
    assert table.shape == (3, 9)
    # rendered png must be crop-sized
    import imageio.v2 as imageio
    img = imageio.imread(os.path.join(tmp_path, "000.png"))
    assert img.shape[:2] == (10, 12)


def test_render_test_full_path_sharded_matches_single(tmp_path):
    """The FULL render_test path (metrics + AP + artifacts) on an 8-device
    mesh must match the single-device run bit-for-bit (VERDICT r1 item 5;
    SURVEY §5 eval all-gather)."""
    import os

    import jax as _jax
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.eval.tester import render_test
    from dmnerf_tpu.parallel.mesh import make_mesh

    assert len(_jax.devices()) == 8
    scene = make_scene(H=8, W=8, n_train=1, n_test=2)
    args = default_config(N_test=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    rows = {}
    for tag, mesh in [("single", None), ("sharded", make_mesh())]:
        render_im = make_image_renderer(cfg, args, 8, 8, mesh=mesh)
        savedir = os.path.join(tmp_path, tag)
        os.makedirs(savedir, exist_ok=True)
        render_test(render_im, state.params, scene.poses[scene.i_test],
                    scene.hwk, args, gt_imgs=scene.images[scene.i_test],
                    gt_labels=scene.gt_labels[scene.i_test],
                    ins_rgbs=scene.ins_rgbs, savedir=savedir)
        rows[tag] = np.loadtxt(os.path.join(savedir, "test_results.txt"))

    # PSNR/SSIM/AP columns identical (LPIPS column is NaN-gated)
    a, b = rows["single"], rows["sharded"]
    np.testing.assert_allclose(np.delete(a, 2, axis=1), np.delete(b, 2, axis=1),
                               rtol=0, atol=1e-6)


def test_render_test_crop_infers_dims_from_mask(tmp_path):
    """crop_mask without crop_height/width flags (synthetic crop scene): the
    rectangle is inferred from the mask instead of crashing."""
    import os

    from dmnerf_tpu.data.synthetic import make_scene_crop
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.eval.tester import render_test

    scene = make_scene_crop(H=16, W=16, n_train=1, n_test=1)
    args = default_config(N_test=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    assert args.crop_height is None or not args.crop_height
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    render_im = make_image_renderer(cfg, args, scene.H, scene.W)
    out = render_test(render_im, state.params, scene.poses[scene.i_test],
                      scene.hwk, args, gt_imgs=scene.images[scene.i_test],
                      gt_labels=scene.gt_labels[scene.i_test],
                      ins_rgbs=scene.ins_rgbs, savedir=str(tmp_path),
                      crop_mask=scene.crop_mask)
    assert out is not None
    assert os.path.exists(os.path.join(tmp_path, "test_results.txt"))
