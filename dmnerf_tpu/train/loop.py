"""Training loop: mirrors the reference's 500k-iteration loop
(/root/reference/train_dmsr.py:17-107) with TPU-native improvements:
- everything per-step happens inside one jit (no host sync except logging),
- orbax checkpoints every i_save with RESUME support (the reference cannot resume),
- periodic in-training eval of 10 random test views every i_test,
- rays/sec throughput counters (the BASELINE.md north-star metric).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.config import Config, log_dir
from dmnerf_tpu.data.base import SceneData
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.checkpoint import (checkpoint_step, latest_checkpoint,
                                         restore_checkpoint, save_checkpoint)
from dmnerf_tpu.train.step import create_train_state, make_train_step


def train(args: Config, scene: SceneData, mesh=None, n_iters=None,
          eval_every=None, on_metrics=None):
    """Run training. Returns the final TrainState."""
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    sampler = "crop" if scene.ins_indices is not None else "full"
    ldir = log_dir(args)
    os.makedirs(ldir, exist_ok=True)

    state = create_train_state(jax.random.PRNGKey(args.seed), cfg,
                               args.lrate, args.lrate_decay)
    start = 0
    if getattr(args, "resume", False):
        ckpt = latest_checkpoint(ldir)
        if ckpt:
            state = restore_checkpoint(ckpt, state)
            start = checkpoint_step(ckpt)
            print(f"resumed from {ckpt} @ step {start}")

    step_fn = make_train_step(args, cfg, sampler=sampler, mesh=mesh)
    arrs = scene.to_device_arrays(mesh)

    n_iters = n_iters if n_iters is not None else int(getattr(args, "n_iters", 500000)) + 1
    eval_every = eval_every if eval_every is not None else args.i_test
    rng = np.random.default_rng(args.seed)
    base_key = jax.random.PRNGKey(args.seed + 1)

    render_chunk = None  # built lazily, reused across eval rounds (one compile)
    t_window = time.time()
    rays_done = 0
    for i in range(start, n_iters):
        img_i = jnp.int32(rng.choice(scene.i_train))
        key = jax.random.fold_in(base_key, i)
        state, metrics = step_fn(state, arrs, key, img_i)
        rays_done += args.N_train

        if i % args.i_print == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_window
            rps = rays_done / dt if dt > 0 else 0.0
            print(f"[TRAIN] Iter: {i} PSNR: {m['psnr_fine']:.4f} "
                  f"Total_Loss: {m['total_loss']:.5f} RGB_Loss: {m['rgb_loss']:.5f} "
                  f"Ins_Loss: {m['ins_loss']:.5f} rays/s: {rps:,.0f}")
            # structured metrics stream (the reference's tensorboard flag is
            # dead code, SURVEY.md §5; a JSONL is greppable and plottable)
            with open(os.path.join(ldir, "metrics.jsonl"), "a") as f:
                import json
                json.dump({"step": i, "rays_per_sec": round(rps, 1),
                           **{k: round(v, 6) for k, v in m.items()}}, f)
                f.write("\n")
            if on_metrics:
                on_metrics(i, m)
            t_window = time.time()
            rays_done = 0

        if i > start and i % args.i_save == 0:
            save_checkpoint(ldir, state, i)

        if eval_every and i > start and i % eval_every == 0:
            if render_chunk is None:
                from dmnerf_tpu.eval.renderer import make_image_renderer
                render_chunk = make_image_renderer(
                    cfg, args, scene.H, scene.W,
                    use_pallas=getattr(args, "use_pallas", False))
            _in_train_eval(args, render_chunk, state, scene, ldir, i, rng)

    return state


def _in_train_eval(args, render_chunk, state, scene, ldir, step, rng):
    """10 random test views, full metrics table (train_dmsr.py:88-107)."""
    from dmnerf_tpu.eval.tester import render_test

    n = min(10, len(scene.i_test))
    sel = scene.i_test[rng.choice(len(scene.i_test), size=n, replace=False)]
    savedir = os.path.join(ldir, f"testset_{step:06d}")
    os.makedirs(savedir, exist_ok=True)
    render_test(render_chunk, state.params, scene.poses[sel], scene.hwk, args,
                gt_imgs=scene.images[sel], gt_labels=scene.gt_labels[sel],
                ins_rgbs=scene.ins_rgbs, savedir=savedir,
                crop_mask=scene.crop_mask)
