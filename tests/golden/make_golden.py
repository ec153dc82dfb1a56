"""Regenerate tests/golden/golden.npz — ONLY when an intentional numerical
change is made; the whole point of the fixture is to make silent numerical
drift loud. Run from the repo root on CPU:

    python tests/golden/make_golden.py

Covers the numerically-sensitive surfaces (SURVEY §7 step 2): the coarse→fine
render (all four stop_gradient placements), the full loss stack (photometric +
Hungarian instance + penalizer), one gradient leaf, and the AP evaluator.
"""

import os
import sys

import numpy as np


def build():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.step import create_train_state, make_train_scan_step
    from dmnerf_tpu.core.rendering import render_rays
    from dmnerf_tpu.core.sampling import z_val_sample
    from dmnerf_tpu.models.fields import apply_field

    out = {}

    # --- render_rays on a fixed field ---
    cfg = FieldConfig(netdepth=2, netwidth=32, multires=4, multires_views=2,
                      ins_num=4, skip=0, compute_dtype=jnp.float32)
    from dmnerf_tpu.models.fields import init_field_params
    params = init_field_params(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(5)
    R, S = 4, 8
    rays_o = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    rays_d = jnp.asarray((rng.normal(size=(R, 3)) + 2.0).astype(np.float32))
    z = z_val_sample(R, 1.0, 6.0, S)
    f = lambda pts, vd: apply_field(params, cfg, pts, vd)
    res = jax.jit(lambda: render_rays(f, f, rays_o, rays_d, z, 8,
                                      key=jax.random.PRNGKey(3), perturb=True))()
    out["render_rgb_fine"] = np.asarray(res["rgb_fine"])
    out["render_ins_fine"] = np.asarray(res["ins_fine"])
    out["render_depth_fine"] = np.asarray(res["depth_fine"])

    # --- one full train step: metrics + a gradient-bearing param slice ---
    scene = make_scene(H=16, W=16, n_train=2, n_test=1)
    args = default_config(N_train=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, perturb=1.0,
                          penalize=True, tolerance=0.05, deta_w=0.05,
                          lrate=5e-3, lrate_decay=500, precision="f32",
                          pallas_train=False,
                          netdepth=2, netwidth=32, multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    tcfg = FieldConfig.from_args(args)
    state = create_train_state(jax.random.PRNGKey(0), tcfg)
    step = make_train_scan_step(args, tcfg, scan_steps=2)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    state, m = step(state, arrs, jax.random.PRNGKey(1), i_train)
    for k, v in m.items():
        out[f"step_{k}"] = np.asarray(v)
    out["step_param_probe"] = np.asarray(state.params["fine"]["density"]["w"][:8, 0])

    # --- AP evaluator on a synthetic prediction ---
    from dmnerf_tpu.eval.instance_ap import ins_eval
    g = np.zeros((24, 24), np.int64)
    g[2:10, 2:10] = 1
    g[14:22, 4:12] = 2
    g[4:9, 15:21] = 3
    K = 6
    rng = np.random.default_rng(9)
    pred = rng.uniform(0, 0.25, (24, 24, K)).astype(np.float32)
    ys, xs = np.mgrid[0:24, 0:24]
    pred[(ys >= 2) & (ys < 11) & (xs >= 2) & (xs < 10), 1] = 0.9   # ~object 1
    pred[(ys >= 14) & (ys < 22) & (xs >= 4) & (xs < 11), 2] = 0.8  # ~object 2
    pred[(ys >= 5) & (ys < 9) & (xs >= 15) & (xs < 21), 4] = 0.7   # ~object 3
    _, ap, matched = ins_eval(pred, g, K)
    out["ap_table"] = np.asarray(ap)
    out["ap_matched"] = np.asarray(matched)
    return out


if __name__ == "__main__":
    sys.path.insert(0, os.getcwd())
    arrs = build()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden.npz")
    np.savez(path, **arrs)
    print(f"wrote {path}:")
    for k, v in arrs.items():
        print(f"  {k}: shape {v.shape}")
