"""Training loop: mirrors the reference's 500k-iteration loop
(/root/reference/train_dmsr.py:17-107) with TPU-native improvements:
- K full steps per dispatch (lax.scan inside one jit): the axon/PCIe dispatch
  latency (~5 ms/program) amortizes to ~0, and the device never idles between
  steps,
- ALL per-step randomness (image pick, pixel pick, perturb, pdf) derives
  in-graph from fold_in(base_key, step): training is a pure function of
  (init, seed, step) and an interrupted+resumed run replays the exact same
  sequence as an uninterrupted one (tests/test_resume.py),
- orbax checkpoints every i_save with RESUME (the reference cannot resume);
  a checkpoint named ckpt_N holds the state after exactly N completed steps,
  so resume never re-executes a step,
- periodic in-training eval of 10 random test views every i_test,
- rays/sec throughput counters (the BASELINE.md north-star metric).
"""

from __future__ import annotations

import os
import time
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.config import Config, log_dir
from dmnerf_tpu.data.base import SceneData
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.checkpoint import (checkpoint_step, latest_checkpoint,
                                         restore_checkpoint, save_checkpoint)
from dmnerf_tpu.train.step import create_train_state, make_train_scan_step


def _scan_stride(args, n_iters: int, eval_every: int) -> int:
    """Largest DIVISOR of the print/save/eval cadences <= 100 (min(gcd, 100)
    would not divide them when gcd > 100)."""
    g = gcd(int(args.i_print), int(args.i_save))
    if eval_every:
        g = gcd(g, int(eval_every))
    g = max(1, g)
    return next(d for d in range(min(g, 100), 0, -1) if g % d == 0)


def train(args: Config, scene: SceneData, mesh=None, n_iters=None,
          eval_every=None, on_metrics=None, scan_steps=None):
    """Run training. Returns the final TrainState."""
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    sampler = "crop" if scene.ins_indices is not None else "full"
    ldir = log_dir(args)
    os.makedirs(ldir, exist_ok=True)

    state = create_train_state(jax.random.PRNGKey(args.seed), cfg,
                               args.lrate, args.lrate_decay,
                               init_scheme=getattr(args, "init_scheme", "he"))
    start = 0
    if getattr(args, "resume", False):
        ckpt = latest_checkpoint(ldir)
        if ckpt:
            state = restore_checkpoint(ckpt, state)
            start = checkpoint_step(ckpt)  # = completed steps; nothing re-runs
            print(f"resumed from {ckpt} @ step {start}")

    n_iters = n_iters if n_iters is not None else int(getattr(args, "n_iters", 500000)) + 1
    eval_every = eval_every if eval_every is not None else args.i_test
    k = (scan_steps or int(getattr(args, "scan_steps", 0) or 0)
         or _scan_stride(args, n_iters, eval_every))
    step_k = make_train_scan_step(args, cfg, sampler=sampler, mesh=mesh,
                                  scan_steps=k)
    step_tail = None  # compiled lazily for the (n_iters - start) % k remainder
    arrs = scene.to_device_arrays(mesh)
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(args.seed + 1)

    # --profile_steps N: capture a jax.profiler trace of N steady-state
    # dispatches (skips the first, which includes compilation) into
    # {logdir}/profile — open with tensorboard/perfetto (SURVEY §5: the
    # reference has no tracing at all)
    profile_steps = int(getattr(args, "profile_steps", 0) or 0)
    profiling = False
    dispatch_i = 0

    render_chunk = None  # built lazily, reused across eval rounds (one compile)
    t_window = time.time()
    rays_done = 0
    done = start
    while done < n_iters:
        if profile_steps and dispatch_i == 1 and not profiling:
            # skip dispatch 0 (includes compilation); trace steady state
            jax.profiler.start_trace(os.path.join(ldir, "profile"))
            profiling = True
        if done + k <= n_iters:
            state, metrics = step_k(state, arrs, base_key, i_train)
            ran = k
        else:
            if step_tail is None:
                step_tail = make_train_scan_step(
                    args, cfg, sampler=sampler, mesh=mesh,
                    scan_steps=n_iters - done)
            ran = n_iters - done
            state, metrics = step_tail(state, arrs, base_key, i_train)
        done += ran
        dispatch_i += 1
        if profiling and (dispatch_i > profile_steps or done >= n_iters):
            jax.block_until_ready(metrics["total_loss"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {os.path.join(ldir, 'profile')}")
            profiling = False
            profile_steps = 0
        rays_done += args.N_train * ran

        # cadence triggers fire on CROSSING each multiple (not exact
        # divisibility) so a user --scan_steps that doesn't divide a cadence
        # still prints/saves/evals at the first dispatch past it
        prev = done - ran
        def crossed(every):
            return every and (done // every) > (prev // every)

        if crossed(args.i_print) or done == n_iters:
            # one batched fetch: per-scalar float() pays the tunnel round-trip
            # latency per metric (~45 ms each on the axon relay)
            m = {k_: float(v) for k_, v in jax.device_get(metrics).items()}
            dt = time.time() - t_window
            rps = rays_done / dt if dt > 0 else 0.0
            print(f"[TRAIN] Iter: {done} PSNR: {m['psnr_fine']:.4f} "
                  f"Total_Loss: {m['total_loss']:.5f} RGB_Loss: {m['rgb_loss']:.5f} "
                  f"Ins_Loss: {m['ins_loss']:.5f} rays/s: {rps:,.0f}")
            # structured metrics stream (the reference's tensorboard flag is
            # dead code, SURVEY.md §5; a JSONL is greppable and plottable)
            with open(os.path.join(ldir, "metrics.jsonl"), "a") as f:
                import json
                json.dump({"step": done, "rays_per_sec": round(rps, 1),
                           **{k_: round(v, 6) for k_, v in m.items()}}, f)
                f.write("\n")
            if on_metrics:
                on_metrics(done, m)
            t_window = time.time()
            rays_done = 0

        # also save the FINAL state even when n_iters isn't a multiple of
        # i_save (the reference silently loses the tail steps at test time —
        # train_dmsr.py:78-86 only saves on i_save multiples)
        if crossed(args.i_save) or done == n_iters:
            save_checkpoint(ldir, state, done)

        if crossed(eval_every) and done < n_iters:
            if render_chunk is None:
                from dmnerf_tpu.eval.renderer import make_image_renderer
                render_chunk = make_image_renderer(
                    cfg, args, scene.H, scene.W, mesh=mesh,
                    use_pallas=getattr(args, "use_pallas", False))
            _in_train_eval(args, render_chunk, state, scene, ldir, done)

    return state


def _in_train_eval(args, render_chunk, state, scene, ldir, step):
    """args.eval_views random test views (default 10, train_dmsr.py:88-107),
    full metrics table. View choice is a pure function of (seed, step) so a
    resumed run evaluates the same views an uninterrupted run would; an
    eval_views >= the split size evaluates ALL test views in a fixed order
    (noise-free quality curves, configs/stress/dmsr_quality.txt)."""
    from dmnerf_tpu.eval.tester import render_test

    n_views = int(getattr(args, "eval_views", 10) or 10)
    if n_views >= len(scene.i_test):
        sel = scene.i_test
    else:
        rng = np.random.default_rng([args.seed, step])
        sel = scene.i_test[rng.choice(len(scene.i_test), size=n_views,
                                      replace=False)]
    savedir = os.path.join(ldir, f"testset_{step:06d}")
    os.makedirs(savedir, exist_ok=True)
    render_test(render_chunk, state.params, scene.poses[sel], scene.hwk, args,
                gt_imgs=scene.images[sel], gt_labels=scene.gt_labels[sel],
                ins_rgbs=scene.ins_rgbs, savedir=savedir,
                crop_mask=scene.crop_mask)
