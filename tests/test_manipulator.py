"""Manipulator: exchanger semantics + full edit pipeline shape/finite checks."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.edit.manipulator import exchanger, manipulate_chunk
from dmnerf_tpu.edit.transforms import generate_poses_eval, pose_spherical, r_z
from dmnerf_tpu.models.fields import FieldConfig, apply_field, init_field_params

K = 3  # object slots; channel layout [rgb(3), sigma(1), ins(K+1)]
C = 4 + K + 1


def make_raw(point_labels, logit=8.0):
    """raw [N, S, C] whose per-point argmax instance = point_labels [N, S]."""
    point_labels = np.asarray(point_labels)
    N, S = point_labels.shape
    raw = np.zeros((N, S, C), np.float32)
    raw[..., 3] = 1.0  # some density
    for n in range(N):
        for s in range(S):
            raw[n, s, 4 + point_labels[n, s]] = logit
    return jnp.asarray(raw)


def accum_for(labels_per_ray):
    """composited ins map [N, K+1] with argmax(air-dropped) = labels_per_ray."""
    a = np.full((len(labels_per_ray), K + 1), 0.1, np.float32)
    for i, l in enumerate(labels_per_ray):
        a[i, l] = 0.9
    return jnp.asarray(a)


def test_exchanger_eliminate():
    """Object on ori rays but not on tar rays -> raw zeroed."""
    ori = make_raw([[1, 1]])          # both points claim object 1
    tar = make_raw([[0, 0]])          # tar rays see background
    out = exchanger(ori, [tar], accum_for([1]), [accum_for([0])], [1])
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_exchanger_exchange():
    """Tar rays see the object -> tar raw taken."""
    ori = make_raw([[0, 0]])
    tar = make_raw([[1, 1]])
    out = exchanger(ori, [tar], accum_for([0]), [accum_for([1])], [1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(tar), atol=1e-6)


def test_exchanger_keep():
    """Neither side involves the object -> untouched."""
    ori = make_raw([[0, 2]])
    tar = make_raw([[0, 0]])
    out = exchanger(ori, [tar], accum_for([0]), [accum_for([0])], [1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ori), atol=1e-6)


def test_exchanger_occlusion_fix_prevents_elimination():
    """Point claims the object but the composited ray label disagrees: the
    point is relabeled to the ray label, so it is NOT eliminated."""
    ori = make_raw([[1, 1]])
    tar = make_raw([[0, 0]])
    # ray-level accum says label 2 (occluder), not the moved object 1
    out = exchanger(ori, [tar], accum_for([2]), [accum_for([0])], [1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ori), atol=1e-6)


def test_exchanger_filling():
    """Ray accum says object but the points don't -> filled from tar raw."""
    ori = make_raw([[0, 0]])
    tar = make_raw([[2, 2]])
    out = exchanger(ori, [tar], accum_for([1]), [accum_for([0])], [1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(tar), atol=1e-6)


@pytest.mark.slow
def test_manipulate_chunk_runs():
    cfg = FieldConfig(netdepth=2, netwidth=32, multires=4, multires_views=2,
                      ins_num=K, compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"coarse": init_field_params(key, cfg),
              "fine": init_field_params(jax.random.fold_in(key, 1), cfg)}
    cf = lambda p, v: apply_field(params["coarse"], cfg, p, v)
    ff = lambda p, v: apply_field(params["fine"], cfg, p, v)

    N = 8
    rng = np.random.default_rng(0)
    ori_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    ori_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    trans = r_z(0.5)
    tar_o = ori_o @ jnp.asarray(trans[:3, :3].T, jnp.float32)
    rgb, ins, trgb, tins = manipulate_chunk(
        cf, ff, (ori_o, ori_d), [(tar_o, ori_d)], [1],
        n_samples=8, n_importance=8, near=1.0, far=6.0)
    assert rgb.shape == (N, 3) and ins.shape == (N, K + 1)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(ins)).all()


def test_generate_poses_eval_center_conjugation(tmp_path):
    import json
    import os

    class A:
        expname = "study"
        datadir = str(tmp_path)
        mani_mode = "rotation"

    out = generate_poses_eval(A())
    T = np.array(out["transformations"][0]["transformation"])
    center = np.array([-0.519422, -2.16509, 1.07392, 1.0])
    # the object center must be a fixed point of the transform
    np.testing.assert_allclose(T @ center, center, atol=1e-5)
    assert os.path.exists(os.path.join(str(tmp_path), "mani", "rotation",
                                       "transformation_matrix.json"))


def test_pose_spherical_shape():
    p = pose_spherical(30.0, -45.0, 4.0)
    assert p.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 4.0, rtol=1e-5)


def test_edit_chunk_cap():
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.edit.manipulator import edit_chunk

    assert edit_chunk(default_config(N_test=4096)) == 128
    assert edit_chunk(default_config(N_test=128)) == 128
    assert edit_chunk(default_config(N_test=1000)) == 1000  # not divisible
    assert edit_chunk(default_config(N_test=64)) == 64      # already smaller
    # 2+ objects double the per-chunk raw working set -> the cap halves
    # (640x480 sweep in the edit_chunk docstring)
    assert edit_chunk(default_config(N_test=4096), n_obj=2) == 64
    assert edit_chunk(default_config(N_test=4096), n_obj=3) == 64
    assert edit_chunk(default_config(N_test=64), n_obj=2) == 64
    assert edit_chunk(default_config(N_test=96), n_obj=2) == 96  # not divisible


@pytest.mark.slow
def test_image_manipulator_chunk_invariant():
    """Whole-image edit result must not depend on the chunk split."""
    import numpy as np
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.core.rays import get_rays
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.edit.manipulator import make_image_manipulator
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.step import create_train_state

    scene = make_scene(H=8, W=8, n_train=1, n_test=1)
    outs = []
    for n_test in (16, 64):
        args = default_config(N_test=n_test, N_samples=8, N_importance=8,
                              near=1.0, far=12.0, precision="f32",
                              netdepth=2, netwidth=32, multires=4,
                              multires_views=2)
        args.ins_num = scene.ins_num
        cfg = FieldConfig.from_args(args)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        ro, rd = get_rays(8, 8, jnp.asarray(scene.K), jnp.asarray(scene.poses[0]))
        ro = np.asarray(ro).reshape(-1, 3)
        rd = np.asarray(rd).reshape(-1, 3)
        run = make_image_manipulator(cfg, state.params, args, 1, [1], 64)
        outs.append(run(jnp.asarray(ro), jnp.asarray(rd),
                        jnp.asarray(ro[None] + 0.2), jnp.asarray(rd[None])))
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_image_manipulator_pallas_accum_matches_xla():
    """use_pallas routes the fine accum passes through the fused composite
    kernel; the edited image must match the XLA path (labels can differ only
    where an accum argmax sits on a knife edge — none on this scene)."""
    import numpy as np
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.core.rays import get_rays
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.edit.manipulator import make_image_manipulator
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.step import create_train_state

    scene = make_scene(H=8, W=8, n_train=1, n_test=1)
    args = default_config(N_test=32, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4,
                          multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    ro, rd = get_rays(8, 8, jnp.asarray(scene.K), jnp.asarray(scene.poses[0]))
    import numpy as _np
    ro = _np.asarray(ro).reshape(-1, 3)
    rd = _np.asarray(rd).reshape(-1, 3)

    outs = []
    for up in (False, True):
        run = make_image_manipulator(cfg, state.params, args, 1, [1], 64,
                                     use_pallas=up)
        outs.append(run(jnp.asarray(ro), jnp.asarray(rd),
                        jnp.asarray(ro[None] + 0.2), jnp.asarray(rd[None])))
    ref, got = outs
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=5e-3, rtol=1e-3)          # rgb
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


@pytest.mark.slow
def test_pose_manipulator_matches_ray_manipulator():
    """make_pose_image_manipulator (in-graph raygen from poses) must equal
    make_image_manipulator fed the host-built rays, including a mixed
    rigid + deform object list and the chunk padding."""
    import numpy as np
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.core.rays import get_rays
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.edit.deform import deform_rays, deform_scale
    from dmnerf_tpu.edit.manipulator import (make_image_manipulator,
                                             make_pose_image_manipulator)
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.step import create_train_state

    H = W = 6  # H*W = 36: NOT a multiple of the chunk -> padding exercised
    scene = make_scene(H=H, W=W, n_train=1, n_test=1)
    args = default_config(N_test=16, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=4,
                          multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)

    ori_pose = np.asarray(scene.poses[0], np.float64)
    trans = np.eye(4)
    trans[:3, 3] = [0.3, -0.1, 0.2]
    view_idx = 1

    # array path (host-built rays, host padding)
    ro, rd = get_rays(H, W, jnp.asarray(scene.K, jnp.float32),
                      jnp.asarray(ori_pose, jnp.float32))
    ro = np.asarray(ro).reshape(-1, 3)
    rd = np.asarray(rd).reshape(-1, 3)
    t0o, t0d = get_rays(H, W, jnp.asarray(scene.K, jnp.float32),
                        jnp.asarray(trans @ ori_pose, jnp.float32))
    t0o = np.asarray(t0o).reshape(-1, 3)
    t0d = np.asarray(t0d).reshape(-1, 3)
    t1o, t1d = deform_rays(ro, rd, "sin", H, W, view_idx)
    n = H * W
    n_pad = (-n) % 16
    pad = lambda x: np.concatenate([x, np.repeat(x[-1:], n_pad, 0)], 0)
    run_arr = make_image_manipulator(cfg, state.params, args, 2, [1, 2],
                                     n + n_pad)
    ref = run_arr(jnp.asarray(pad(ro)), jnp.asarray(pad(rd)),
                  jnp.asarray(np.stack([pad(t0o), pad(t1o)])),
                  jnp.asarray(np.stack([pad(t0d), pad(t1d)])))

    # pose path (in-graph raygen + padding)
    run_pose = make_pose_image_manipulator(
        cfg, state.params, args,
        objs=[{"mode": "rigid"}, {"mode": "deform", "deform_func": "sin"}],
        move_labels=[1, 2], H=H, W=W, K=scene.K)
    got = run_pose(jnp.asarray(ori_pose, jnp.float32),
                   jnp.asarray(np.stack([trans @ ori_pose, ori_pose]),
                               jnp.float32),
                   jnp.asarray([0.0, deform_scale("sin", view_idx)],
                               jnp.float32))

    np.testing.assert_allclose(np.asarray(got[0])[:n], np.asarray(ref[0])[:n],
                               atol=2e-5, rtol=2e-5)
    for k in (1, 2):
        np.testing.assert_array_equal(np.asarray(got[k])[:n],
                                      np.asarray(ref[k])[:n])
    np.testing.assert_allclose(np.asarray(got[3])[:n], np.asarray(ref[3])[:n],
                               atol=2e-5, rtol=2e-5)
