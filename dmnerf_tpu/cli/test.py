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


def _resolve_test_model(ldir: str, test_model: str):
    """Translate a --test_model value to a checkpoint directory.

    Accepts reference-style names ('200000.tar', config.py:58-59 /
    test_dmsr.py:89), bare step numbers ('200000'), or our native
    'ckpt_200000'. A requested-but-missing checkpoint is an ERROR (the
    round-1 behavior of silently loading the latest instead hid typos).
    '000000.tar' is the reference's flag default and means "unset".
    """
    if not test_model or test_model == "000000.tar":
        return None
    name = test_model
    if name.endswith(".tar"):
        name = name[:-len(".tar")]
    if not name.startswith("ckpt_"):
        if not name.isdigit():
            raise ValueError(f"--test_model {test_model!r}: expected "
                             "'NNNNNN(.tar)' or 'ckpt_NNNNNN'")
        name = f"ckpt_{int(name):06d}"
    cand = os.path.join(ldir, name)
    if not os.path.isdir(cand):
        raise FileNotFoundError(
            f"--test_model {test_model!r}: checkpoint {cand} does not exist")
    return cand


def _load_state(args, ldir):
    cfg = FieldConfig.from_args(args)
    template = create_train_state(jax.random.PRNGKey(0), cfg,
                                  args.lrate, args.lrate_decay)
    ckpt = _resolve_test_model(ldir, args.test_model)
    if ckpt is None:
        ckpt = latest_checkpoint(ldir)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {ldir}")
    state = restore_checkpoint(ckpt, template)
    return cfg, state, checkpoint_step(ckpt)


def _color_dict(args):
    """GT-label -> palette-index map for this scene (reference consumption:
    tester.py:50-52, manipulator.py:221-223, mesh_generator.py:15-17).
    Ships in data/color_dict.json; falls back to None (identity map downstream)
    only for scenes the dict doesn't know (e.g. the synthetic fixture)."""
    import dmnerf_tpu
    from dmnerf_tpu.utils.viz import load_color_dict
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(dmnerf_tpu.__file__)))
    for path in (os.path.join("data", "color_dict.json"),
                 os.path.join(repo_root, "data", "color_dict.json")):
        if os.path.exists(path):
            try:
                parts = [p for p in args.datadir.replace("\\", "/").split("/") if p]
                return load_color_dict(path, dataset_name_from_dir(args.datadir),
                                       parts[-1])
            except KeyError:
                continue
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

    # multi-chip eval: shard the ray axis over all devices (SURVEY §5 —
    # gathered image tiles ride ICI; params replicated)
    mesh = None
    if len(jax.devices()) > 1:
        from dmnerf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(0)
        print(f"eval sharded over {mesh.devices.size} devices")

    from dmnerf_tpu.eval.renderer import make_image_renderer

    if args.render:
        from dmnerf_tpu.eval.tester import render_test
        savedir = os.path.join(ldir, f"render_test_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        i_test = scene.i_test
        render_im = make_image_renderer(cfg, args, scene.H, scene.W, mesh=mesh,
                                        use_pallas=getattr(args, "use_pallas", False))
        render_test(render_im, params, scene.poses[i_test], scene.hwk, args,
                    gt_imgs=scene.images[i_test], gt_labels=scene.gt_labels[i_test],
                    ins_rgbs=scene.ins_rgbs, savedir=savedir,
                    crop_mask=scene.crop_mask, color_dict=color_dict)
        print("Rendering Done", savedir)

    elif args.mani_eval:
        from dmnerf_tpu.edit.runner import manipulator_eval
        from dmnerf_tpu.edit.transforms import generate_poses_eval, load_mani_poses
        if getattr(args, "resolve_target_label", False):
            from dmnerf_tpu.edit.runner import resolve_target_channel
            plain = load_dataset(args)  # unedited scene (GT labels per view)
            args.target_label = resolve_target_channel(cfg, params, args,
                                                       plain, mesh=mesh)
        generate_poses_eval(args)
        trans_dicts = load_mani_poses(args)
        savedir = os.path.join(ldir, f"mani_eval_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        manipulator_eval(cfg, params, scene.poses, scene.hwk, trans_dicts, savedir,
                         scene.ins_rgbs, args, gt_rgbs=scene.images,
                         gt_labels=scene.gt_labels, color_dict=color_dict,
                         mesh=mesh)
        print("Manipulating Done", savedir)

    elif args.mani_demo:
        from dmnerf_tpu.edit.runner import manipulator_demo
        from dmnerf_tpu.edit.transforms import (generate_poses_demo,
                                                load_mani_demo_poses)
        if getattr(args, "resolve_target_label", False):
            # objs_info tar_ids are GT labels here (generated fixtures);
            # the reference ships CHANNEL ids hand-picked per checkpoint —
            # resolve all of them in one Hungarian-matching pass
            from dmnerf_tpu.edit.runner import resolve_target_channel
            gt_ids = [int(o["tar_id"]) for o in scene.objs]
            ch_map = resolve_target_channel(cfg, params, args, scene,
                                            mesh=mesh, targets=gt_ids)
            for o in scene.objs:
                o["tar_id"] = ch_map[int(o["tar_id"])]
        generate_poses_demo(scene.objs, args)
        objs_trans = load_mani_demo_poses(args)
        savedir = os.path.join(ldir, f"mani_demo_{iteration:06d}")
        os.makedirs(savedir, exist_ok=True)
        manipulator_demo(cfg, params, scene.hwk, objs_trans, savedir,
                         scene.ins_rgbs, scene.objs, scene.view_poses,
                         scene.ins_map, args, color_dict=color_dict, mesh=mesh)
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
