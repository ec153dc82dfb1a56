"""Attribute train-step wall-clock to components by ablation.

Builds variants of the real train step with one component stubbed at a time and
times each as a 50-step scan dispatch (the deployed path). The difference
full - ablated is that component's serialized cost on the TPU (one core: no
overlap, so the decomposition is additive to first order).

Variants:
  full        the deployed step (bench.py workload)
  no_lap      lap_square replaced by identity permutation (costs still built)
  no_adam     tx.update/apply replaced by params - 1e-9 * grads (sgd)
  fixed_pix   pixel choice replaced by iota (no choice-without-replacement)
  det_pdf     perturb off + det inverse-CDF (no in-graph uniforms)
  no_pen      penalizer off
  fields_only grad of sum(raw_c^2)+sum(raw_f^2) through both field evals
              (fwd+bwd kernels + raygen, no composite/losses/optimizer)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmnerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.config import default_config
from dmnerf_tpu.data.synthetic import make_scene
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train import step as step_mod
from dmnerf_tpu.train.step import create_train_state, make_train_scan_step

SCAN = 50


def make_args(**kw):
    args = default_config(
        N_train=3072, N_samples=64, N_importance=128,
        near=1.0, far=12.0, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05,
        lrate=5e-4, lrate_decay=500, precision="bf16",
        netdepth=8, netwidth=256, multires=10, multires_views=4,
        pallas_train=True)
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def scene_arrays():
    scene = make_scene(H=128, W=128, n_train=4, n_test=4)
    yy, xx = np.meshgrid(np.arange(scene.H), np.arange(scene.W), indexing="ij")
    sub = ((yy * 2) // scene.H) * 4 + ((xx * 4) // scene.W)
    scene.gt_labels = (scene.gt_labels * 8 + sub[None]).astype(scene.gt_labels.dtype)
    return scene


def time_scan(step_fn, state, arrs, base_key, i_train, n_dispatch=3):
    state2, m = step_fn(state, arrs, base_key, i_train)
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state2, m = step_fn(state2, arrs, base_key, i_train)
    jax.block_until_ready(m["total_loss"])
    return (time.perf_counter() - t0) / (SCAN * n_dispatch) * 1e3


def main():
    args = make_args()
    scene = scene_arrays()
    args.ins_num = 32
    cfg = FieldConfig.from_args(args)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(1)

    results = {}

    def run(tag, **patch):
        import dmnerf_tpu.ops.lap as lap_mod
        import dmnerf_tpu.train.step as sm

        saved = {}
        try:
            if patch.get("no_lap"):
                saved["lap"] = lap_mod.lap_square
                ident = lambda cost, n_valid=None: jnp.arange(
                    cost.shape[0], dtype=jnp.int32)
                lap_mod.lap_square = ident
                # instance.py captured the symbol at import time
                import dmnerf_tpu.losses.instance as inst
                saved["lap2"] = inst.lap_square
                inst.lap_square = ident
            if patch.get("no_adam"):
                saved["opt"] = sm.make_optimizer
                import optax
                sm.make_optimizer = lambda lr, k: optax.sgd(1e-9)
            if patch.get("fixed_pix"):
                saved["pix"] = sm._select_pixels_full
                sm._select_pixels_full = \
                    lambda key, H, W, n: jnp.arange(n, dtype=jnp.int32) * 5
            a = make_args(**{k: v for k, v in patch.items()
                             if k in ("perturb", "penalize")})
            a.ins_num = args.ins_num
            state = create_train_state(jax.random.PRNGKey(0), cfg,
                                       a.lrate, a.lrate_decay)
            fn = make_train_scan_step(a, cfg, scan_steps=SCAN)
            ms = time_scan(fn, state, arrs, base_key, i_train)
            results[tag] = ms
            print(f"{tag:12s} {ms:7.2f} ms/step"
                  + ("" if tag == "full" else
                     f"   (delta {results['full'] - ms:+6.2f})"), flush=True)
        finally:
            if "lap" in saved:
                lap_mod.lap_square = saved["lap"]
                import dmnerf_tpu.losses.instance as inst
                inst.lap_square = saved["lap2"]
            if "opt" in saved:
                sm.make_optimizer = saved["opt"]
            if "pix" in saved:
                sm._select_pixels_full = saved["pix"]

    run("full")
    run("no_lap", no_lap=True)
    run("no_adam", no_adam=True)
    run("fixed_pix", fixed_pix=True)
    run("det_pdf", perturb=0.0)
    run("no_pen", penalize=False)

    # fields_only: raygen + both field evals fwd+bwd, nothing else
    from dmnerf_tpu.core.rays import rays_at_pixels
    from dmnerf_tpu.core.sampling import z_val_sample
    from dmnerf_tpu.ops.pallas.field_kernels import make_trainable_pallas_field

    field = make_trainable_pallas_field(cfg)
    n_train, ns, ni = args.N_train, args.N_samples, args.N_importance

    def floss(params, rays_o, rays_d, z_c, z_f):
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        pts_c = rays_o[:, None, :] + rays_d[:, None, :] * z_c[:, :, None]
        raw_c = field(params["coarse"], pts_c, vd[:, None, :])
        pts_f = rays_o[:, None, :] + rays_d[:, None, :] * z_f[:, :, None]
        raw_f = field(params["fine"], pts_f, vd[:, None, :])
        return jnp.sum(raw_c ** 2) * 1e-9 + jnp.sum(raw_f ** 2) * 1e-9

    @jax.jit
    def fields_scan(params, scene_arrs, base_key):
        z_c = z_val_sample(n_train, args.near, args.far, ns)
        z_f = z_val_sample(n_train, args.near, args.far, ns + ni)

        def body(p, i):
            key = jax.random.fold_in(base_key, i)
            pix = jax.random.randint(key, (n_train,), 0, 128 * 128)
            rays_o, rays_d = rays_at_pixels(pix, 128, scene_arrs.K,
                                            scene_arrs.poses[0])
            g = jax.grad(floss)(p, rays_o, rays_d, z_c, z_f)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
            return p, ()

        p, _ = jax.lax.scan(body, params, jnp.arange(SCAN))
        return p

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    p = fields_scan(state.params, arrs, base_key)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(3):
        p = fields_scan(p, arrs, base_key)
    jax.block_until_ready(p)
    ms = (time.perf_counter() - t0) / (SCAN * 3) * 1e3
    print(f"{'fields_only':12s} {ms:7.2f} ms/step   "
          f"(glue = {results['full'] - ms:6.2f})", flush=True)


if __name__ == "__main__":
    main()
