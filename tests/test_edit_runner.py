"""Integration: manipulation eval/demo orchestration on the synthetic scene
(CPU, tiny net, untrained params — exercises the full edit path + artifacts)."""

import os

import pytest

import jax
import numpy as np

from dmnerf_tpu.config import default_config
from dmnerf_tpu.data.synthetic import make_scene
from dmnerf_tpu.edit.runner import manipulator_demo, manipulator_eval
from dmnerf_tpu.edit.transforms import _center_conjugate, _mode_matrix
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.step import create_train_state


def _setup():
    scene = make_scene(H=12, W=12, n_train=1, n_test=2)
    args = default_config(N_test=144, N_samples=6, N_importance=6,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=2, netwidth=32, multires=3, multires_views=2,
                          target_label=1, mani_mode="translation",
                          mani_type="rigid", views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    return scene, args, cfg, state


@pytest.mark.slow
def test_manipulator_eval_runs(tmp_path):
    scene, args, cfg, state = _setup()
    trans = _center_conjugate(_mode_matrix("translation"), [0.0, 0.0, 0.0])
    trans_dicts = {"transformations": [
        {"transformation": trans.tolist(), "mode": "translation"}]}
    sel = scene.i_test
    out = manipulator_eval(cfg, state.params, scene.poses[sel], scene.hwk,
                           trans_dicts, str(tmp_path), scene.ins_rgbs, args,
                           gt_rgbs=scene.images[sel],
                           gt_labels=scene.gt_labels[sel])
    psnr, ap = out
    assert np.isfinite(psnr)
    d = os.path.join(tmp_path, "translation")
    assert os.path.exists(os.path.join(d, "test_results.txt"))
    table = np.loadtxt(os.path.join(d, "test_results.txt"))
    assert table.shape == (3, 9)
    assert os.path.exists(os.path.join(d, "0_rgb.png"))
    assert os.path.exists(os.path.join(d, "0_ins.png"))
    assert os.path.exists(os.path.join(d, "matching_log.json"))


@pytest.mark.slow
def test_manipulator_demo_runs(tmp_path):
    scene, args, cfg, state = _setup()
    objs = [
        {"obj_name": "box1", "tar_id": 1, "mani_mode": "translation",
         "obj_center": [0.0, 0.0, 0.0], "distance": [0.5]},
        {"obj_name": "box2", "tar_id": 2, "mani_mode": "deform",
         "deform_func": "sin"},
    ]
    from dmnerf_tpu.edit.transforms import generate_poses_demo

    class A2:
        datadir = str(tmp_path)
        views = 2

    a2 = A2()
    objs_trans = generate_poses_demo(objs, a2)
    assert "box1" in objs_trans and len(objs_trans["box1"]) == 2

    manipulator_demo(cfg, state.params, scene.hwk, objs_trans, str(tmp_path),
                     scene.ins_rgbs, objs, scene.poses[scene.i_test][:1],
                     {"1": 1}, args)
    d = os.path.join(tmp_path, "rigid")
    assert os.path.exists(os.path.join(d, "0_rgb.png"))
    assert os.path.exists(os.path.join(d, "0_ins_pred_mask.png"))


def test_resolve_target_channel(monkeypatch, tmp_path):
    """--resolve_target_label: a GT instance label must resolve to the trained
    model's prediction CHANNEL (the Hungarian loss leaves the binding an
    arbitrary permutation). Fake the renderer with a known permutation and
    check the majority vote recovers it."""
    import dmnerf_tpu.eval.renderer as renderer_mod
    from dmnerf_tpu.edit.runner import resolve_target_channel

    scene, args, cfg, state = _setup()
    args.resolve_target_label = True
    # channel perm applied to GT labels; ins_num channels >= labels present
    perm = {int(l): int((l * 3 + 2) % scene.ins_num)
            for l in np.unique(np.asarray(scene.gt_labels))}
    assert len(set(perm.values())) == len(perm)  # injective

    poses = np.asarray(scene.poses)

    def fake_make_image_renderer(cfg_, args_, H, W, mesh=None,
                                 use_pallas=False, fused=None):
        def render_im(params, K, c2w):
            c2w = np.asarray(c2w)
            (vi,) = [i for i in range(len(poses))
                     if np.allclose(poses[i], c2w)]
            gt = np.asarray(scene.gt_labels[vi])
            label = np.vectorize(perm.get)(gt).astype(np.int32)
            conf = np.full(label.shape, 0.9, np.float32)
            rgb = np.zeros(label.shape + (3,), np.float32)
            depth = np.ones(label.shape, np.float32)
            return rgb, label, conf, depth
        return render_im

    monkeypatch.setattr(renderer_mod, "make_image_renderer",
                        fake_make_image_renderer)
    ch = resolve_target_channel(cfg, state.params, args, scene)
    assert ch == perm[int(args.target_label)]

    # a GT label absent from every test view must raise, not silently pick 0
    args.target_label = scene.ins_num + 7
    import pytest
    with pytest.raises(ValueError):
        resolve_target_channel(cfg, state.params, args, scene)
