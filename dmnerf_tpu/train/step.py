"""The jitted training step.

Mirrors the reference hot loop (/root/reference/train_dmsr.py:24-64) with a
TPU-native dataflow:
- all images/labels/poses live in device HBM; per step only (key, img_i) change.
- pixel selection, ray generation, coarse→fine rendering, losses, and the
  Hungarian assignment all run inside ONE jit — there is no per-step host sync
  (the reference syncs to CPU scipy every step, evaluator.py:43-52).
- under a 1-D device mesh the ray batch is sharded ('data' axis); parameter
  gradients and the [K, K] instance-loss matmuls psum over ICI automatically.

Pixel samplers:
- "full": uniform N_train pixels of one image (helpers.py:99-111).
- "crop" (ScanNet): 30% labeled-instance pixels, rest uniform within the center
  crop EXCLUDING the labeled picks, labeled rays stacked LAST so the loss
  slices ins_map[-N_ins:] (helpers.py:64-95, render.py:88-90). Deviation from
  reference: when an image has fewer labeled pixels than N_ins we sample
  labeled pixels with replacement instead of shrinking N_ins (static shapes
  under jit).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dmnerf_tpu.core.rays import rays_at_pixels
from dmnerf_tpu.core.rendering import render_rays
from dmnerf_tpu.core.sampling import z_val_sample
from dmnerf_tpu.losses.emptiness import ins_penalizer
from dmnerf_tpu.losses.instance import ins_criterion_pair
from dmnerf_tpu.losses.photometric import img2mse, mse2psnr
from dmnerf_tpu.models.fields import FieldConfig, apply_field, init_field_params
from dmnerf_tpu.parallel.mesh import shard_batch
from dmnerf_tpu.train.schedule import exp_decay_schedule


class TrainState(NamedTuple):
    params: Any        # {'coarse': pytree, 'fine': pytree}
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


class SceneArrays(NamedTuple):
    """Device-resident training data."""
    images: jnp.ndarray                 # [N, H, W, 3] f32 in [0,1]
    labels: jnp.ndarray                 # [N, H, W] int32
    poses: jnp.ndarray                  # [N, 4, 4] f32 (c2w)
    K: jnp.ndarray                      # [3, 3] f32
    labeled_idx: Optional[jnp.ndarray] = None  # [N, max_lab] int32, padded
    labeled_cnt: Optional[jnp.ndarray] = None  # [N] int32
    crop_idx: Optional[jnp.ndarray] = None     # [n_crop] int32 flat pixel ids


def make_optimizer(lrate: float, lrate_decay_k: int) -> optax.GradientTransformation:
    """Adam(β=0.9/0.999, eps=1e-8) with the reference's continuous exp decay."""
    return optax.adam(exp_decay_schedule(lrate, lrate_decay_k), b1=0.9, b2=0.999)


def create_train_state(key: jax.Array, cfg: FieldConfig, lrate: float = 5e-4,
                       lrate_decay_k: int = 500,
                       init_scheme: str = "he") -> TrainState:
    """init_scheme: 'he' (default, dead-seed-safe) or 'torch' (the reference's
    exact nn.Linear distribution, for parity experiments — see
    models.fields._linear_init for why it is not the default)."""
    kc, kf = jax.random.split(key)
    params = {"coarse": init_field_params(kc, cfg, init_scheme),
              "fine": init_field_params(kf, cfg, init_scheme)}
    tx = make_optimizer(lrate, lrate_decay_k)
    return TrainState(params, tx.init(params), jnp.int32(0))


def _select_pixels_full(key, H, W, n_train):
    return jax.random.choice(key, H * W, (n_train,), replace=False)


def _select_pixels_crop(key, scene: SceneArrays, img_i, n_train, n_ins, n_pix):
    k_lab, k_unlab = jax.random.split(key)
    max_lab = scene.labeled_idx.shape[1]
    cnt = scene.labeled_cnt[img_i]
    # uniform permutation of the valid slots, invalid slots pushed to the end
    u = jax.random.uniform(k_lab, (max_lab,)) + (jnp.arange(max_lab) >= cnt) * 1e9
    order = jnp.argsort(u)
    sel = order[:n_ins]
    # if cnt < n_ins, wrap around (sample with replacement) instead of shrinking
    sel = jnp.where(jnp.arange(n_ins) < cnt, sel,
                    order[jnp.arange(n_ins) % jnp.maximum(cnt, 1)])
    lab_pix = scene.labeled_idx[img_i][sel]

    # unlabeled pool = crop \ selected-labeled (helpers.py:81-84 intent; the
    # reference then indexes crop_indices with positions drawn over the SHRUNK
    # range — a latent indexing slip — so "exact" here means the intended
    # exclusion, static-shape: scatter the picks into a dense flag, gather it
    # along the crop, exclude via key penalty, take the n_rgb smallest keys)
    n_rgb = n_train - n_ins
    flag = jnp.zeros((n_pix,), jnp.float32).at[lab_pix].set(1.0)
    keys = jax.random.uniform(k_unlab, (scene.crop_idx.shape[0],))
    keys = keys + flag[scene.crop_idx] * 1e9
    _, pos = jax.lax.top_k(-keys, n_rgb)
    unlab_pix = scene.crop_idx[pos]
    return jnp.concatenate([unlab_pix, lab_pix]), lab_pix  # labeled LAST


def make_train_step(args, cfg: FieldConfig, sampler: str = "full", mesh=None,
                    axis_name: str = "data"):
    """Build the jitted train step.

    args needs: N_train, N_samples, N_importance, near, far, perturb, penalize,
    tolerance, deta_w, lrate, lrate_decay, ins_num, remat.
    Returns step_fn(state, scene, key, img_i) -> (state, metrics).
    """
    n_train = int(args.N_train)
    n_samples = int(args.N_samples)
    n_importance = int(args.N_importance)
    near, far = float(args.near), float(args.far)
    penalize = bool(args.penalize)
    perturb = float(args.perturb) > 0.0
    ins_num = int(args.ins_num)
    n_ins = int(n_train * 0.3) if sampler == "crop" else None
    tx = make_optimizer(args.lrate, args.lrate_decay)

    if getattr(args, "pallas_train", False):
        # fused fwd+bwd field kernel: no HBM activations, no remat needed
        from dmnerf_tpu.ops.pallas.field_kernels import \
            make_trainable_pallas_field
        _ptf = make_trainable_pallas_field(cfg, mesh=mesh)
        field = lambda p, _cfg, pts, vd: _ptf(p, pts, vd)
    elif getattr(args, "remat", True):
        field = jax.checkpoint(apply_field, static_argnums=(1,))
    else:
        field = apply_field

    model_parallel = mesh is not None and "model" in mesh.shape

    def loss_fn(params, rays_o, rays_d, target_c, target_i, key):
        if model_parallel:
            from dmnerf_tpu.parallel.mesh import shard_params_model
            params = shard_params_model(params, mesh)
        coarse_fn = lambda pts, vd: field(params["coarse"], cfg, pts, vd)
        fine_fn = lambda pts, vd: field(params["fine"], cfg, pts, vd)
        z_coarse = z_val_sample(n_train, near, far, n_samples)
        out = render_rays(coarse_fn, fine_fn, rays_o, rays_d, z_coarse,
                          n_importance, key=key, perturb=perturb)

        rgb_loss_c = img2mse(out["rgb_coarse"], target_c)
        rgb_loss_f = img2mse(out["rgb_fine"], target_c)

        ins_c = out["ins_coarse"][-n_ins:] if n_ins else out["ins_coarse"]
        ins_f = out["ins_fine"][-n_ins:] if n_ins else out["ins_fine"]
        lg_c = out["ins_logits_coarse"][-n_ins:] if n_ins else out["ins_logits_coarse"]
        lg_f = out["ins_logits_fine"][-n_ins:] if n_ins else out["ins_logits_fine"]
        loss_c, loss_f = ins_criterion_pair(ins_c, ins_f, target_i, ins_num,
                                            logits_coarse=lg_c, logits_fine=lg_f)
        ins_loss_c, ins_loss_f = loss_c.total, loss_f.total

        rgb_loss = rgb_loss_f + rgb_loss_c
        ins_loss = ins_loss_f + ins_loss_c
        total = rgb_loss + ins_loss

        if penalize:
            empt_c = ins_penalizer(out["raw_coarse"], out["z_vals_coarse"],
                                   out["depth_coarse"], rays_d,
                                   args.tolerance, args.deta_w)
            empt_f = ins_penalizer(out["raw_fine"], out["z_vals_fine"],
                                   out["depth_fine"], rays_d,
                                   args.tolerance, args.deta_w)
            total = total + empt_c + empt_f

        metrics = {
            "psnr_fine": mse2psnr(rgb_loss_f),
            "psnr_coarse": mse2psnr(rgb_loss_c),
            "rgb_loss": rgb_loss,
            "ins_loss": ins_loss,
            "total_loss": total,
        }
        return total, metrics

    def _step_core(state: TrainState, scene: SceneArrays, key: jax.Array, img_i):
        H, W = scene.images.shape[1:3]
        k_pix, k_ren = jax.random.split(key)

        if sampler == "crop":
            pix, lab_pix = _select_pixels_crop(k_pix, scene, img_i, n_train,
                                               n_ins, H * W)
            target_i = scene.labels[img_i].reshape(-1)[lab_pix]
        else:
            pix = _select_pixels_full(k_pix, H, W, n_train)
            target_i = scene.labels[img_i].reshape(-1)[pix]

        pose = scene.poses[img_i]
        rays_o, rays_d = rays_at_pixels(pix, W, scene.K, pose)
        target_c = scene.images[img_i].reshape(-1, 3)[pix]

        if mesh is not None:
            rays_o, rays_d, target_c = shard_batch(
                (rays_o, rays_d, target_c), mesh, axis_name)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rays_o, rays_d, target_c, target_i, k_ren)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, scene: SceneArrays, key: jax.Array, img_i):
        return _step_core(state, scene, key, img_i)

    step_fn.core = _step_core
    return step_fn


def make_train_scan_step(args, cfg: FieldConfig, sampler: str = "full", mesh=None,
                         axis_name: str = "data", scan_steps: int = 1):
    """Build a jitted multi-step train function: `scan_steps` full training steps
    per dispatch via lax.scan.

    TPU rationale: the axon tunnel costs ~5 ms of dispatch latency per program —
    ~10% of a 55 ms step, and proportionally more as the step gets faster.
    Scanning K steps inside one jit amortizes that to ~0 and keeps the device
    busy between host visits.

    All per-step randomness (image choice, pixel choice, perturb, pdf) is derived
    in-graph as fold_in(base_key, state.step), so training is a pure function of
    (params0, base_key, step): an interrupted+resumed run replays the SAME image
    and pixel sequence as an uninterrupted one (the reference's host-RNG sequence
    has no such property, train_dmsr.py:25).

    Returns scan_fn(state, scene, base_key, i_train) -> (state, metrics of the
    last inner step). i_train: int32 device array of training image indices.
    """
    core = make_train_step(args, cfg, sampler=sampler, mesh=mesh,
                           axis_name=axis_name).core

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_fn(state: TrainState, scene: SceneArrays, base_key: jax.Array,
                i_train: jnp.ndarray):
        def body(st, _):
            key = jax.random.fold_in(base_key, st.step)
            k_img, k_step = jax.random.split(key)
            idx = jax.random.randint(k_img, (), 0, i_train.shape[0])
            return core(st, scene, k_step, i_train[idx])
        state, ms = jax.lax.scan(body, state, None, length=scan_steps)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return scan_fn
