"""Test CLI: render / manipulation eval / manipulation demo / meshing.

Replaces test_{dmsr,replica,scannet}.py; mode dispatch mirrors
/root/reference/test_dmsr.py:13-70 (--render, --mani_eval, --mani_demo, --mesh).
Loads the latest (or --test_model-matching) orbax checkpoint from
{basedir}/{expname}/{log_time}/.
"""

from __future__ import annotations

import os

from dmnerf_tpu.config import initial, log_dir
from dmnerf_tpu.data.base import dataset_name_from_dir, load_dataset
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.checkpoint import (checkpoint_step, latest_checkpoint,
                                         restore_checkpoint)
from dmnerf_tpu.train.step import create_train_state

import jax


def _load_state(args, ldir):
    cfg = FieldConfig.from_args(args)
    template = create_train_state(jax.random.PRNGKey(0), cfg,
                                  args.lrate, args.lrate_decay)
    ckpt = None
    if args.test_model and args.test_model not in ("000000.tar",):
        cand = os.path.join(ldir, args.test_model)
        if os.path.isdir(cand):
            ckpt = cand
    if ckpt is None:
        ckpt = latest_checkpoint(ldir)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {ldir}")
    state = restore_checkpoint(ckpt, template)
    return cfg, state, checkpoint_step(ckpt)


def _color_dict(args):
    from dmnerf_tpu.utils.viz import load_color_dict
    path = os.path.join("data", "color_dict.json")
    if os.path.exists(path):
        try:
            parts = [p for p in args.datadir.replace("\\", "/").split("/") if p]
            return load_color_dict(path, dataset_name_from_dir(args.datadir), parts[-1])
        except KeyError:
            pass
    return None


def main(argv=None):
    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = initial(argv)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    args.is_train = False
    args.perturb = 0.0

    if args.mani_eval:
        from dmnerf_tpu.data.dmsr_mani import load_data as load_mani
        scene = load_mani(args)
    else:
        scene = load_dataset(args)
    args.ins_num = scene.ins_num

    ldir = log_dir(args)
    cfg, state, iteration = _load_state(args, ldir)
    params = state.params
    color_dict = _color_dict(args)

    from dmnerf_tpu.eval.renderer import make_image_renderer

    if args.render:
        from dmnerf_tpu.eval.tester import render_test
        savedir = os.path.join(ldir, f"render_test_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        i_test = scene.i_test
        render_im = make_image_renderer(cfg, args, scene.H, scene.W,
                                        use_pallas=getattr(args, "use_pallas", False))
        render_test(render_im, params, scene.poses[i_test], scene.hwk, args,
                    gt_imgs=scene.images[i_test], gt_labels=scene.gt_labels[i_test],
                    ins_rgbs=scene.ins_rgbs, savedir=savedir,
                    crop_mask=scene.crop_mask, color_dict=color_dict)
        print("Rendering Done", savedir)

    elif args.mani_eval:
        from dmnerf_tpu.edit.runner import manipulator_eval
        from dmnerf_tpu.edit.transforms import generate_poses_eval, load_mani_poses
        generate_poses_eval(args)
        trans_dicts = load_mani_poses(args)
        savedir = os.path.join(ldir, f"mani_eval_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        manipulator_eval(cfg, params, scene.poses, scene.hwk, trans_dicts, savedir,
                         scene.ins_rgbs, args, gt_rgbs=scene.images,
                         gt_labels=scene.gt_labels, color_dict=color_dict)
        print("Manipulating Done", savedir)

    elif args.mani_demo:
        from dmnerf_tpu.edit.runner import manipulator_demo
        from dmnerf_tpu.edit.transforms import (generate_poses_demo,
                                                load_mani_demo_poses)
        generate_poses_demo(scene.objs, args)
        objs_trans = load_mani_demo_poses(args)
        savedir = os.path.join(ldir, f"mani_demo_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        manipulator_demo(cfg, params, scene.hwk, objs_trans, savedir,
                         scene.ins_rgbs, scene.objs, scene.view_poses,
                         scene.ins_map, args, color_dict=color_dict)
        print("Manipulating Demo Done", savedir)

    elif args.mesh:
        from dmnerf_tpu.mesh.extract import extract_mesh
        savedir = os.path.join(ldir, f"mesh_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        ply_path = os.path.join(args.datadir, args.expname + ".ply")
        extract_mesh(params, cfg, args,
                     ply_path if os.path.exists(ply_path) else None, savedir,
                     ins_rgbs=scene.ins_rgbs, color_dict=color_dict,
                     ins_map=scene.ins_map)
        print("Meshing Done", savedir)


if __name__ == "__main__":
    main()
