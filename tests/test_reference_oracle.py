"""Direct A/B parity tests against the reference's OWN PyTorch modules.

These tests sys.path-import /root/reference/networks/{dm_nerf,render,evaluator,
penalizer,manipulator}.py, copy identical weights/inputs into both frameworks,
and assert allclose — converting "we read the reference correctly" into "we
measured we match the reference's executable behavior".

Surfaces covered (verdict r2 item 1):
  1. field forward            (dm_nerf.py:58-106)        f64, tol 1e-10
  2. composite/render_train   (render.py:6-28)           f64, tol 1e-12
  3. full coarse→fine dm_nerf (render.py:31-96)          f32, tol 1e-4 [a]
  4. ins_criterion value+grad (evaluator.py:19-74)       f64, tol 1e-9
  5. ins_penalizer value+grad (penalizer.py:5-62)        f64, tol 5e-5 [b]
  6. full train-loss gradients (train_dmsr.py:34-60)     f32, rel 1e-3 [a]
  7. the four detach points — exact-zero grad structure in BOTH frameworks
     (dm_nerf.py:95, render.py:22-26, render.py:68, penalizer.py:59)
  8. exchanger                (manipulator.py:18-83)     exact equality
  9. ins_eval / calculate_ap  (evaluator.py:77-175)      f64, tol 1e-9
 10. hungarian cost matrices  (evaluator.py:41-74)       f64, tol 1e-12
 11. sample_pdf / z_val_sample / get_rays_k (helpers.py) f32/f64
 12. pose_spherical + generate_poses_eval + generate_poses_demo
     (tools/pose_generator.py:29-232) — eval: all 4 modes x all 8 hardcoded
     scene centers; demo: cumulative translation / rotation sweep / scale /
     multi sequences; f64 tol 1e-6
 13. visualizer label->color mappers (tools/visualizer.py:7-19,57-86,208-223)
     — exact uint8 equality incl. partial color_dict/ins_map coverage
 14. FULL manipulator two-pass pipeline (manipulator.py:86-205) — 2 moved
     objects, copied weights, det-pinned sample_pdf; f32 tol 2e-4
 15. FULL render_test entry (tester.py:17-162) — chunked render, metrics,
     ins_eval, matching_log.json, test_results.txt, pngs; AP columns and all
     instance/gt artifacts EXACT, rgb within 1 uint8 LSB; both the full-image
     and the ScanNet crop+masked-eval flavors
 16. FULL manipulator_eval entry (manipulator.py:208-364) — per-view
     whole-image edit, metrics vs GT renders, ins_eval, matching log, table
     and png artifacts; same exactness bars as surface 15
 17. FULL manipulator_demo entry (manipulator.py:367-491) — 2-object rigid
     and 2-object deform (sin+ln) flavors, artifact-exact (the reference
     cannot mix flavors: stack shape clash at manipulator.py:438)
 18. optimizer chain (train_dmsr.py:125,:66-73) — Adam mechanics f64 tol
     1e-12 over a 10-step grad sequence, the exp-decay law, and the combined
     trajectory incl. the reference's one-step LR lag (documented)
 19. mesh_main's NN-query stages (mesh_generator.py:12-143) — grid builder
     (tools/visualizer.py:111-155), zero-viewdir density->occupancy, and the
     fixed-z vertex-coloring ray march; labels exact (the trimesh/skimage/
     open3d isosurface geometry itself cannot run here — ours is validated
     on analytic surfaces in test_mesh.py)

[a] render.py:38 hard-casts viewdirs with .float(), so the full pipeline can
    only be A/B'd in f32; tolerances there absorb fp32 noise across the 8-deep
    MLP. Every pure surface is compared in f64.
[b] our penalizer/criterion use the exact softplus BCE; the reference computes
    log(sigmoid(x) + 1e-8) whose value differs by <= 1e-8/p — the tolerance is
    that documented epsilon bound, not slop.
"""

from __future__ import annotations

import contextlib
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.oracle

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub_missing(name: str, **attrs):
    try:
        present = importlib.util.find_spec(name) is not None
    except (ModuleNotFoundError, ValueError):
        present = False
    if present or name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference's modules with unavailable heavy deps stubbed
    (lpips/cv2/imageio/open3d are only touched by I/O paths we don't call)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("lpips", "cv2", "imageio", "open3d"):
        _stub_missing(name)
    _stub_missing("matplotlib")
    _stub_missing("matplotlib.pyplot")
    if "matplotlib" in sys.modules and not hasattr(sys.modules["matplotlib"], "pyplot"):
        sys.modules["matplotlib"].pyplot = sys.modules.get("matplotlib.pyplot")
    _stub_missing("skimage")
    _stub_missing("skimage.metrics")
    if "skimage" in sys.modules and not hasattr(sys.modules["skimage"], "metrics"):
        sys.modules["skimage"].metrics = sys.modules.get("skimage.metrics")

    import networks.dm_nerf as r_dm
    import networks.render as r_render
    import networks.evaluator as r_eval
    import networks.penalizer as r_pen
    import networks.helpers as r_help
    import networks.manipulator as r_mani

    # dm_nerf.py:5 enables anomaly detection at import; it 10x-es backward time
    torch.autograd.set_detect_anomaly(False)
    return types.SimpleNamespace(dm=r_dm, render=r_render, ev=r_eval,
                                 pen=r_pen, hp=r_help, mani=r_mani)


@contextlib.contextmanager
def torch_f64():
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(old)


# ---------------------------------------------------------------- helpers

def small_cfg(dtype, w=128, ins_num=6, multires=6, multires_views=3):
    from dmnerf_tpu.models.fields import FieldConfig
    return FieldConfig(netdepth=8, netwidth=w, multires=multires,
                       multires_views=multires_views, ins_num=ins_num,
                       compute_dtype=dtype)


def torch_model_from_params(ref, params, cfg):
    """Build the reference DM_NeRF and copy our param pytree into it
    (our kernels are [fan_in, fan_out]; torch Linear stores [out, in])."""
    model = ref.dm.DM_NeRF(D=cfg.netdepth, W=cfg.netwidth,
                           input_ch_pts=cfg.pos_ch, input_ch_views=cfg.view_ch,
                           skips=[cfg.skip], ins_num=cfg.ins_num)

    def cp(linear, layer):
        with torch.no_grad():
            linear.weight.copy_(torch.from_numpy(np.asarray(layer["w"]).T.copy()))
            linear.bias.copy_(torch.from_numpy(np.asarray(layer["b"]).copy()))

    for i, layer in enumerate(params["trunk"]):
        cp(model.mlps[i], layer)
    cp(model.density_linear, params["density"])
    cp(model.rgb_feature_linear, params["rgb_feat"])
    cp(model.rgb_feature_linears[0], params["rgb_hidden"])
    cp(model.rgb_linear, params["rgb_out"])
    cp(model.ins_feature_linear, params["ins_feat"])
    cp(model.ins_feature_linears[0], params["ins_hidden"])
    cp(model.ins_linear, params["ins_out"])
    return model.to(torch.get_default_dtype())


def torch_field_forward(ref, model, cfg, pts_np, dirs_np):
    """Reference-side field eval: embed + concat + model (render.py:54-60)."""
    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    dt = torch.get_default_dtype()
    pts = torch.from_numpy(pts_np).to(dt)
    dirs = torch.from_numpy(dirs_np).to(dt)
    x = torch.cat([pe.embed(pts), ve.embed(dirs)], dim=-1)
    return model(x)


def rand_rays(rng, n):
    rays_o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    rays_d = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_d *= rng.uniform(0.8, 1.3, (n, 1)).astype(np.float32)  # non-unit norms
    return rays_o, rays_d


# ---------------------------------------------------------------- 1. field fwd

def test_field_forward_f64(ref):
    """apply_field == reference DM_NeRF forward, full-size arch, f64."""
    from dmnerf_tpu.models.fields import apply_field, init_field_params

    cfg = small_cfg(jnp.float64, w=256, ins_num=8, multires=10, multires_views=4)
    params = init_field_params(jax.random.PRNGKey(0), cfg, scheme="torch")
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (96, 3)).astype(np.float64)
    dirs = rng.normal(size=(96, 3)).astype(np.float64)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    with torch_f64():
        model = torch_model_from_params(ref, params, cfg)
        with torch.no_grad():
            out_t = torch_field_forward(ref, model, cfg, pts, dirs).numpy()

    with jax.enable_x64(True):
        out_j = np.asarray(apply_field(params, cfg, jnp.asarray(pts),
                                       jnp.asarray(dirs)))
    assert out_j.dtype == np.float64
    np.testing.assert_allclose(out_j, out_t, atol=1e-10, rtol=1e-10)


# ---------------------------------------------------------------- 2. composite

def test_composite_matches_render_train_f64(ref):
    from dmnerf_tpu.core.rendering import composite

    rng = np.random.default_rng(2)
    n, s, k = 24, 33, 7
    raw = rng.normal(size=(n, s, 4 + k + 1)).astype(np.float64) * 1.5
    z = np.sort(rng.uniform(2.0, 6.0, (n, s)).astype(np.float64), axis=-1)
    _, rays_d = rand_rays(rng, n)
    rays_d = rays_d.astype(np.float64)

    with torch_f64():
        rgb_t, w_t, d_t, ins_t = ref.render.render_train(
            torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rays_d))

    with jax.enable_x64(True):
        out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))

    np.testing.assert_allclose(np.asarray(out.rgb), rgb_t.numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.weights), w_t.numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.depth), d_t.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.ins), ins_t.numpy(), atol=1e-12)


# ---------------------------------------------------------------- 3. pipeline

def _pipeline_fixtures(ref, seed=3, n=16, s=20, imp=20):
    from dmnerf_tpu.models.fields import init_field_params

    cfg = small_cfg(jnp.float32)
    kc, kf = jax.random.split(jax.random.PRNGKey(seed))
    pc = init_field_params(kc, cfg, scheme="torch")
    pf = init_field_params(kf, cfg, scheme="torch")
    rng = np.random.default_rng(seed)
    rays_o, rays_d = rand_rays(rng, n)
    z = np.broadcast_to(np.linspace(2.0, 6.0, s, dtype=np.float32), (n, s)).copy()
    return cfg, pc, pf, rays_o, rays_d, z, imp


def _ref_args(imp, ins_num, tolerance=0.1, deta_w=0.3):
    return types.SimpleNamespace(perturb=0.0, N_importance=imp, is_train=False,
                                 N_ins=None, ins_num=ins_num,
                                 tolerance=tolerance, deta_w=deta_w)


def _ref_pipeline(ref, cfg, pc, pf, rays_o, rays_d, z, imp, grad=False):
    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    mc = torch_model_from_params(ref, pc, cfg)
    mf = torch_model_from_params(ref, pf, cfg)
    rays = torch.stack([torch.from_numpy(rays_o), torch.from_numpy(rays_d)])
    ctx = contextlib.nullcontext() if grad else torch.no_grad()
    with ctx:
        info = ref.render.dm_nerf(rays, pe, ve, mc, mf, torch.from_numpy(z),
                                  _ref_args(imp, cfg.ins_num))
    return mc, mf, info


def _jax_pipeline(cfg, pc, pf, rays_o, rays_d, z, imp):
    from dmnerf_tpu.core.rendering import render_rays
    from dmnerf_tpu.models.fields import apply_field

    return render_rays(
        lambda pts, vd: apply_field(pc, cfg, pts, vd),
        lambda pts, vd: apply_field(pf, cfg, pts, vd),
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z), imp,
        key=None, perturb=False)


def test_full_pipeline_forward_f32(ref):
    """Deterministic coarse→fine dm_nerf (render.py:31-96) end to end."""
    cfg, pc, pf, rays_o, rays_d, z, imp = _pipeline_fixtures(ref)
    _, _, info = _ref_pipeline(ref, cfg, pc, pf, rays_o, rays_d, z, imp)
    out = _jax_pipeline(cfg, pc, pf, rays_o, rays_d, z, imp)

    for key, tol in (("rgb_coarse", 1e-5), ("rgb_fine", 1e-4),
                     ("ins_coarse", 1e-5), ("ins_fine", 1e-4),
                     ("z_vals_fine", 1e-4), ("depth_coarse", 1e-4),
                     ("depth_fine", 5e-4), ("raw_coarse", 5e-4),
                     ("raw_fine", 5e-3)):
        np.testing.assert_allclose(np.asarray(out[key]), info[key].numpy(),
                                   atol=tol, err_msg=key)


# ---------------------------------------------------------------- 4. criterion

def _criterion_case(seed, n, ins_num, n_labels):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0.02, 0.98, (n, ins_num)).astype(np.float64)
    labels = np.concatenate([np.arange(n_labels),
                             rng.integers(0, n_labels, n - n_labels)])
    # the reference one-hots via F.one_hot(gt)[..., unique(gt)] — labels are
    # remapped to slots; any label ids < ins_num work
    return pred, labels.astype(np.int64)


@pytest.mark.parametrize("n_labels,ins_num", [(4, 9), (9, 9)])
def test_ins_criterion_value_f64(ref, n_labels, ins_num):
    """Both the partial (invalid_ce active) and full-slot branches."""
    from dmnerf_tpu.losses.instance import ins_criterion

    pred, labels = _criterion_case(40 + n_labels, 64, ins_num, n_labels)
    with torch_f64():
        tot_t, vce_t, ice_t, siou_t = ref.ev.ins_criterion(
            torch.from_numpy(pred), torch.from_numpy(labels), ins_num)
    with jax.enable_x64(True):
        out = ins_criterion(jnp.asarray(pred), jnp.asarray(labels), ins_num)

    np.testing.assert_allclose(float(out.valid_ce), float(vce_t), atol=1e-9)
    np.testing.assert_allclose(float(out.invalid_ce), float(ice_t), atol=1e-9)
    np.testing.assert_allclose(float(out.valid_siou), float(siou_t), atol=1e-9)
    np.testing.assert_allclose(float(out.total), float(tot_t), atol=1e-9)


def test_ins_criterion_grad_f64(ref):
    """d loss / d pred_ins — the exact gradient the train step backpropagates
    through the instance head (train_dmsr.py:38-45)."""
    from dmnerf_tpu.losses.instance import ins_criterion

    pred, labels = _criterion_case(7, 48, 8, 5)
    with torch_f64():
        p_t = torch.from_numpy(pred).requires_grad_(True)
        tot_t, _, _, _ = ref.ev.ins_criterion(p_t, torch.from_numpy(labels), 8)
        tot_t.sum().backward()
        g_t = p_t.grad.numpy()
    with jax.enable_x64(True):
        g_j = np.asarray(jax.grad(
            lambda p: ins_criterion(p, jnp.asarray(labels), 8).total
        )(jnp.asarray(pred)))
    np.testing.assert_allclose(g_j, g_t, atol=1e-9)


# ---------------------------------------------------------------- 5. penalizer

def test_ins_penalizer_f64(ref):
    """Value + grad wrt raw. Tolerance = the reference's 1e-8 BCE epsilon
    (we use the exact softplus form; see losses/emptiness.py docstring)."""
    from dmnerf_tpu.losses.emptiness import ins_penalizer

    rng = np.random.default_rng(11)
    n, s, k = 20, 24, 5
    raw = (rng.normal(size=(n, s, 4 + k + 1)) * 2.0).astype(np.float64)
    z = np.sort(rng.uniform(2.0, 6.0, (n, s)), axis=-1)
    _, rays_d = rand_rays(rng, n)
    rays_d = rays_d.astype(np.float64)
    depth = rng.uniform(2.5, 5.5, (n,)).astype(np.float64)
    tolerance, deta_w = 0.2, 0.4

    with torch_f64():
        raw_t = torch.from_numpy(raw).requires_grad_(True)
        loss_t = ref.pen.ins_penalizer(raw_t, torch.from_numpy(z),
                                       torch.from_numpy(depth),
                                       torch.from_numpy(rays_d),
                                       _ref_args(0, k, tolerance, deta_w))
        loss_t.backward()
        g_t = raw_t.grad.numpy()

    with jax.enable_x64(True):
        fn = lambda r: ins_penalizer(r, jnp.asarray(z), jnp.asarray(depth),
                                     jnp.asarray(rays_d), tolerance, deta_w)
        loss_j, g_j = jax.value_and_grad(fn)(jnp.asarray(raw))

    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=5e-5)
    np.testing.assert_allclose(np.asarray(g_j), g_t, atol=5e-5)


# ---------------------------------------------------------------- 6. train grads

def _torch_grads_to_pytree(model):
    g = {}
    sd = dict(model.named_parameters())

    def pick(name):
        w = sd[name + ".weight"].grad
        b = sd[name + ".bias"].grad
        return {"w": None if w is None else w.detach().numpy().T.copy(),
                "b": None if b is None else b.detach().numpy().copy()}

    g["trunk"] = [pick(f"mlps.{i}") for i in range(len(model.mlps))]
    g["density"] = pick("density_linear")
    g["rgb_feat"] = pick("rgb_feature_linear")
    g["rgb_hidden"] = pick("rgb_feature_linears.0")
    g["rgb_out"] = pick("rgb_linear")
    g["ins_feat"] = pick("ins_feature_linear")
    g["ins_hidden"] = pick("ins_feature_linears.0")
    g["ins_out"] = pick("ins_linear")
    return g


def _ref_total_loss(ref, info, rays_d_t, target_c, target_i, ins_num,
                    tolerance, deta_w):
    """Exact train-loss composition of train_dmsr.py:34-60 (penalize on)."""
    rgb_loss = (ref.ev.img2mse(info["rgb_coarse"], target_c)
                + ref.ev.img2mse(info["rgb_fine"], target_c))
    ins_c, _, _, _ = ref.ev.ins_criterion(info["ins_coarse"], target_i, ins_num)
    ins_f, _, _, _ = ref.ev.ins_criterion(info["ins_fine"], target_i, ins_num)
    args = _ref_args(0, ins_num, tolerance, deta_w)
    pen = (ref.pen.ins_penalizer(info["raw_coarse"], info["z_vals_coarse"],
                                 info["depth_coarse"], rays_d_t, args)
           + ref.pen.ins_penalizer(info["raw_fine"], info["z_vals_fine"],
                                   info["depth_fine"], rays_d_t, args))
    return (rgb_loss + ins_c + ins_f + pen).sum()


def _jax_total_loss(cfg, params, rays_o, rays_d, z, imp, target_c, target_i,
                    tolerance, deta_w):
    from dmnerf_tpu.losses.emptiness import ins_penalizer
    from dmnerf_tpu.losses.instance import ins_criterion

    out = _jax_pipeline(cfg, params["coarse"], params["fine"],
                        rays_o, rays_d, z, imp)
    tc = jnp.asarray(target_c)
    rgb_loss = (jnp.mean((out["rgb_coarse"] - tc) ** 2)
                + jnp.mean((out["rgb_fine"] - tc) ** 2))
    ti = jnp.asarray(target_i)
    ins = (ins_criterion(out["ins_coarse"], ti, cfg.ins_num).total
           + ins_criterion(out["ins_fine"], ti, cfg.ins_num).total)
    rd = jnp.asarray(rays_d)
    pen = (ins_penalizer(out["raw_coarse"], out["z_vals_coarse"],
                         out["depth_coarse"], rd, tolerance, deta_w)
           + ins_penalizer(out["raw_fine"], out["z_vals_fine"],
                           out["depth_fine"], rd, tolerance, deta_w))
    return rgb_loss + ins + pen


def test_full_train_gradients_f32(ref):
    """loss.backward() == jax.grad on the complete train loss — the strongest
    single parity statement (field + composite + pdf resampling + both losses
    + all four stop_gradient placements must match to pass)."""
    cfg, pc, pf, rays_o, rays_d, z, imp = _pipeline_fixtures(ref, seed=5)
    rng = np.random.default_rng(6)
    target_c = rng.uniform(0, 1, (rays_o.shape[0], 3)).astype(np.float32)
    target_i = rng.integers(0, 4, rays_o.shape[0])
    tolerance, deta_w = 0.2, 0.4

    mc, mf, info = _ref_pipeline(ref, cfg, pc, pf, rays_o, rays_d, z, imp,
                                 grad=True)
    loss_t = _ref_total_loss(ref, info, torch.from_numpy(rays_d),
                             torch.from_numpy(target_c),
                             torch.from_numpy(target_i), cfg.ins_num,
                             tolerance, deta_w)
    loss_t.backward()
    g_t = {"coarse": _torch_grads_to_pytree(mc), "fine": _torch_grads_to_pytree(mf)}

    params = {"coarse": pc, "fine": pf}
    loss_j, g_j = jax.value_and_grad(
        lambda p: _jax_total_loss(cfg, p, rays_o, rays_d, z, imp,
                                  target_c, target_i, tolerance, deta_w)
    )(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-4)

    flat_t = jax.tree_util.tree_leaves_with_path(g_t)
    flat_j = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, g_j)))
    checked = 0
    for path, leaf_t in flat_t:
        leaf_j = flat_j[path]
        if leaf_t is None:
            assert np.abs(leaf_j).max() == 0.0, f"{path}: torch None, jax nonzero"
            continue
        denom = np.linalg.norm(leaf_t) + 1e-12
        rel = np.linalg.norm(leaf_j - leaf_t) / denom
        assert rel < 1e-3, f"{jax.tree_util.keystr(path)}: rel grad err {rel:.2e}"
        checked += 1
    assert checked >= 30  # every layer of both models compared


def test_detach_structure_exact_zero(ref):
    """The four stop_gradient placements, as exact-zero gradient structure,
    asserted in BOTH frameworks:
      - ins loss → trunk/density/rgb params: zero (dm_nerf.py:95 trunk detach
        + render.py:22-26 detached compositing weights)
      - fine rgb loss → coarse params: zero (render.py:68 z_samples detach;
        fine z only reaches coarse params through the detached resampling)
      - penalizer → density/rgb params: zero (penalizer.py:59 depth detach;
        only instance logits remain in the graph)
    """
    cfg, pc, pf, rays_o, rays_d, z, imp = _pipeline_fixtures(ref, seed=8, n=8)
    rng = np.random.default_rng(9)
    target_c = rng.uniform(0, 1, (8, 3)).astype(np.float32)
    target_i = rng.integers(0, 3, 8)

    def torch_component_grads(component):
        mc, mf, info = _ref_pipeline(ref, cfg, pc, pf, rays_o, rays_d, z, imp,
                                     grad=True)
        rd = torch.from_numpy(rays_d)
        if component == "ins":
            loss, _, _, _ = ref.ev.ins_criterion(
                info["ins_fine"], torch.from_numpy(target_i), cfg.ins_num)
        elif component == "rgb_fine":
            loss = ref.ev.img2mse(info["rgb_fine"], torch.from_numpy(target_c))
        else:  # penalizer on the fine pass
            loss = ref.pen.ins_penalizer(info["raw_fine"], info["z_vals_fine"],
                                         info["depth_fine"], rd,
                                         _ref_args(0, cfg.ins_num, 0.2, 0.4))
        loss.sum().backward()
        return {"coarse": _torch_grads_to_pytree(mc),
                "fine": _torch_grads_to_pytree(mf)}

    def jax_component_grads(component):
        def loss_fn(p):
            from dmnerf_tpu.losses.emptiness import ins_penalizer
            from dmnerf_tpu.losses.instance import ins_criterion
            out = _jax_pipeline(cfg, p["coarse"], p["fine"],
                                rays_o, rays_d, z, imp)
            if component == "ins":
                return ins_criterion(out["ins_fine"], jnp.asarray(target_i),
                                     cfg.ins_num).total
            if component == "rgb_fine":
                return jnp.mean((out["rgb_fine"] - jnp.asarray(target_c)) ** 2)
            return ins_penalizer(out["raw_fine"], out["z_vals_fine"],
                                 out["depth_fine"], jnp.asarray(rays_d),
                                 0.2, 0.4)
        return jax.grad(loss_fn)({"coarse": pc, "fine": pf})

    def assert_zero(grads, model_key, param_keys, who):
        for pk in param_keys:
            sub = grads[model_key]["trunk"] if pk == "trunk" else [grads[model_key][pk]]
            for leaf in sub:
                for arr in leaf.values():
                    if arr is None:
                        continue
                    assert np.abs(np.asarray(arr)).max() == 0.0, \
                        f"{who}: {model_key}/{pk} expected exactly zero"

    for grads, who in ((torch_component_grads("ins"), "torch"),
                       (jax_component_grads("ins"), "jax")):
        assert_zero(grads, "fine", ["trunk", "density", "rgb_feat",
                                    "rgb_hidden", "rgb_out"], who + "/ins")
    for grads, who in ((torch_component_grads("rgb_fine"), "torch"),
                       (jax_component_grads("rgb_fine"), "jax")):
        assert_zero(grads, "coarse", ["trunk", "density", "rgb_feat",
                                      "rgb_hidden", "rgb_out", "ins_feat",
                                      "ins_hidden", "ins_out"], who + "/rgbf")
    for grads, who in ((torch_component_grads("pen"), "torch"),
                       (jax_component_grads("pen"), "jax")):
        assert_zero(grads, "fine", ["trunk", "density", "rgb_feat",
                                    "rgb_hidden", "rgb_out"], who + "/pen")


# ---------------------------------------------------------------- 8. exchanger

def _exchanger_case(seed, n, s, k, n_obj):
    """Crafted raws whose argmax labels hit every exchanger branch: occlusion
    fixes, fillings, eliminate, exchange, keep."""
    rng = np.random.default_rng(seed)
    c = 4 + k + 1
    ori_raw = rng.normal(size=(n, s, c)).astype(np.float32) * 2
    tar_raws = [rng.normal(size=(n, s, c)).astype(np.float32) * 2
                for _ in range(n_obj)]
    # accumulated (composited) sigmoid maps with air channel kept — random
    # probabilities cover agree/disagree combinations across rays
    ori_accum = rng.uniform(0.01, 0.99, (n, k + 1)).astype(np.float32)
    tar_accums = [rng.uniform(0.01, 0.99, (n, k + 1)).astype(np.float32)
                  for _ in range(n_obj)]
    move_labels = list(rng.choice(k, size=n_obj, replace=False).astype(int))
    return ori_raw, tar_raws, ori_accum, tar_accums, move_labels


@pytest.mark.parametrize("n_obj", [1, 2])
def test_exchanger_exact(ref, n_obj):
    from dmnerf_tpu.edit.manipulator import exchanger

    ori_raw, tar_raws, ori_accum, tar_accums, move_labels = \
        _exchanger_case(20 + n_obj, 32, 12, 6, n_obj)

    # reference mutates in place → pass clones. It takes the PRE-logit accum?
    # No: manipulator.py:152 passes the sigmoid ins map and exchanger:24
    # re-sigmoids — monotonic, so argmax is unchanged; feed the same map.
    out_t, _, _, _ = ref.mani.exchanger(
        torch.from_numpy(ori_raw.copy()),
        [torch.from_numpy(t.copy()) for t in tar_raws],
        torch.from_numpy(ori_accum.copy()),
        [torch.from_numpy(t.copy()) for t in tar_accums],
        list(move_labels))

    out_j = exchanger(jnp.asarray(ori_raw), [jnp.asarray(t) for t in tar_raws],
                      jnp.asarray(ori_accum),
                      [jnp.asarray(t) for t in tar_accums], move_labels)

    np.testing.assert_array_equal(np.asarray(out_j), out_t.numpy())


# ---------------------------------------------------------------- 9. ins_eval

def _ref_gt_onehot(gt_label_t, ins_num):
    """tester.py-style gt one-hot: slots ordered by ascending present label."""
    import torch.nn.functional as F
    valid = torch.unique(gt_label_t)
    gt_ins = torch.zeros(size=(*gt_label_t.shape, ins_num))
    gt_ins[..., :len(valid)] = F.one_hot(gt_label_t.long())[..., valid.long()]
    return gt_ins, len(valid)


@pytest.mark.parametrize("with_mask", [False, True])
def test_ins_eval_matches_reference(ref, with_mask):
    from dmnerf_tpu.eval.instance_ap import ins_eval

    rng = np.random.default_rng(31 + with_mask)
    h, w, k, n_obj = 24, 20, 10, 5
    # cluster-ish predictions so several pred labels exist with varied conf
    logits = rng.normal(size=(h, w, k)).astype(np.float64)
    gt = rng.integers(0, n_obj, (h, w))
    logits[np.arange(h)[:, None], np.arange(w)[None, :], gt] += \
        rng.uniform(0, 4, (h, w))
    pred_prob = 1 / (1 + np.exp(-logits))
    mask = None
    if with_mask:
        mask = (rng.uniform(size=(h, w)) > 0.2).astype(np.int64)
        mask[0, 0] = 0  # guarantee at least one out-of-mask pixel

    gt_t = torch.from_numpy(gt)
    gt_ins, gt_num = _ref_gt_onehot(gt_t, k)
    pred_t = torch.from_numpy(pred_prob).to(torch.float32)
    out = ref.ev.ins_eval(pred_t, gt_ins, gt_num, k,
                          mask=None if mask is None else torch.from_numpy(mask))
    pred_label_t, ap_t, matched_t = out

    pred_label_j, ap_j, matched_j = ins_eval(pred_prob.astype(np.float32),
                                             gt, k, mask=mask)

    np.testing.assert_array_equal(pred_label_j, pred_label_t.numpy())
    np.testing.assert_allclose(np.asarray(ap_j), np.asarray(ap_t), atol=1e-9)
    np.testing.assert_array_equal(matched_j, matched_t)


def test_calculate_ap_matches_reference(ref):
    from dmnerf_tpu.eval.instance_ap import calculate_ap

    rng = np.random.default_rng(41)
    ious = rng.uniform(0.3, 1.0, 7)
    conf = rng.uniform(0.2, 1.0, 7)
    gt_number = 9  # > len(ious): recall saturates below 1
    ap_t = ref.ev.calculate_ap(torch.from_numpy(ious).float(), gt_number,
                               confidence=torch.from_numpy(conf).float(),
                               function_select='integral')
    ap_j = calculate_ap(ious, gt_number, confidence=conf)
    np.testing.assert_allclose(ap_j, ap_t, atol=1e-6)
    # 11-point interpolation flavor too (evaluator.py:78-86)
    ap_t = ref.ev.calculate_ap(torch.from_numpy(ious).float(), gt_number,
                               confidence=torch.from_numpy(conf).float(),
                               function_select='interpolate')
    ap_j = calculate_ap(ious, gt_number, confidence=conf,
                        function_select='interpolate')
    np.testing.assert_allclose(ap_j, ap_t, atol=1e-6)


# ---------------------------------------------------------------- 10. hungarian

def test_hungarian_costs_and_order(ref):
    from dmnerf_tpu.eval.instance_ap import hungarian

    rng = np.random.default_rng(51)
    n, k, valid = 200, 8, 5
    pred = rng.uniform(0.01, 0.99, (n, k)).astype(np.float64)
    gt = np.zeros((n, k))
    gt[np.arange(n), rng.integers(0, valid, n)] = 1.0

    with torch_f64():
        ce_t, siou_t, row_t, col_t = ref.ev.hungarian(
            torch.from_numpy(pred), torch.from_numpy(gt), valid, k)
    ce_j, siou_j, row_j, col_j = hungarian(pred, gt, valid, k)

    np.testing.assert_allclose(ce_j, ce_t.numpy(), atol=1e-12)
    np.testing.assert_allclose(siou_j, siou_t.numpy(), atol=1e-12)
    np.testing.assert_array_equal(row_j, row_t)
    np.testing.assert_array_equal(col_j, col_t)


# ---------------------------------------------------------------- 11. helpers

def test_sample_pdf_det_matches_reference(ref):
    from dmnerf_tpu.core.sampling import sample_pdf

    rng = np.random.default_rng(61)
    n, b, s = 32, 23, 17
    bins = np.sort(rng.uniform(2, 6, (n, b)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 1, (n, b - 1)).astype(np.float32)

    out_t = ref.hp.sample_pdf(torch.from_numpy(bins),
                              torch.from_numpy(weights), s, det=True)
    out_j = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), s, det=True)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)


def test_z_val_sample_and_rays(ref):
    from dmnerf_tpu.core.rays import get_rays
    from dmnerf_tpu.core.sampling import z_val_sample

    z_t = ref.hp.z_val_sample(5, 2.0, 6.0, 11)
    z_j = z_val_sample(5, 2.0, 6.0, 11)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-6)

    rng = np.random.default_rng(71)
    K = np.array([[120.0, 0, 80.0], [0, -120.0, 60.0], [0, 0, -1.0]],
                 dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    c2w[:3, 3] = rng.normal(size=3).astype(np.float32)

    o_t, d_t = ref.hp.get_rays_k(120, 160, torch.from_numpy(K),
                                 torch.from_numpy(c2w))
    o_j, d_j = get_rays(120, 160, jnp.asarray(K), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o_j), o_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=1e-5)


# ------------------------------------------------- 12. pose generator (tools/)

def _ref_pose_generator(ref):
    """Load the reference's tools/pose_generator.py by path (its `tools`
    package name collides with this repo's tools/)."""
    spec = importlib.util.spec_from_file_location(
        "ref_pose_generator", REF + "/tools/pose_generator.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pose_spherical_matches_reference(ref):
    from dmnerf_tpu.edit.transforms import pose_spherical
    rp = _ref_pose_generator(ref)
    for theta in (-180.0, -30.0, 0.0, 45.0, 120.0):
        for phi in (-90.0, -30.0, 0.0, 15.0):
            ours = pose_spherical(theta, phi, 4.0)
            theirs = rp.pose_spherical(theta, phi, 4.0).numpy()
            np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_generate_poses_eval_matches_reference(ref, tmp_path):
    """A/B the T_c^-1 @ M @ T_c eval transforms (pose_generator.py:53-128)
    for every mode x every hardcoded scene center."""
    from dmnerf_tpu.edit.transforms import MANI_CENTERS, generate_poses_eval
    rp = _ref_pose_generator(ref)

    for scene in MANI_CENTERS:
        for mode in ("translation", "rotation", "scale", "multi"):
            ref_dir = tmp_path / "ref" / scene
            our_dir = tmp_path / "ours" / scene
            (ref_dir / "mani" / mode).mkdir(parents=True, exist_ok=True)
            ref_args = types.SimpleNamespace(datadir=str(ref_dir),
                                             mani_mode=mode, expname=scene)
            our_args = types.SimpleNamespace(datadir=str(our_dir),
                                             mani_mode=mode, expname=scene)
            theirs = rp.generate_poses_eval(ref_args)
            ours = generate_poses_eval(our_args)
            tl = theirs["transformations"]
            ol = ours["transformations"]
            assert len(tl) == len(ol) == 1
            assert ol[0]["mode"] == tl[0]["mode"] == mode
            np.testing.assert_allclose(
                np.array(ol[0]["transformation"]),
                np.array(tl[0]["transformation"]), atol=1e-6,
                err_msg=f"{scene}/{mode}")
            # both persist loadable jsons at the same relative path
            import json as _json
            with open(ref_dir / "mani" / mode /
                      "transformation_matrix.json") as f:
                _json.load(f)
            with open(our_dir / "mani" / mode /
                      "transformation_matrix.json") as f:
                _json.load(f)


def test_generate_poses_demo_matches_reference(ref, tmp_path):
    """A/B the demo per-object transform sequences (pose_generator.py:131-232):
    cumulative translation steps, linspace rotation sweep, scale/multi, deform
    skipped."""
    import json as _json

    from dmnerf_tpu.edit.transforms import generate_poses_demo
    rp = _ref_pose_generator(ref)

    objs = [
        {"obj_name": "a", "mani_mode": "translation",
         "obj_center": [0.5, -1.0, 0.25], "distance": [0.6, -0.4]},
        {"obj_name": "b", "mani_mode": "rotation",
         "obj_center": [-0.2, 0.3, 1.0], "rotation": 90.0},
        {"obj_name": "c", "mani_mode": "scale", "obj_center": [0.0, 0.0, 0.0]},
        {"obj_name": "d", "mani_mode": "multi", "obj_center": [1.0, 2.0, 3.0]},
        {"obj_name": "e", "mani_mode": "deform", "obj_center": [0, 0, 0],
         "deform_func": "sin"},
    ]
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    (ref_dir / "mani").mkdir(parents=True)
    rp.generate_poses_demo(objs, types.SimpleNamespace(datadir=str(ref_dir),
                                                       views=4))
    with open(ref_dir / "mani" / "transformation_matrix.json") as f:
        theirs = _json.load(f)
    ours = generate_poses_demo(objs, types.SimpleNamespace(datadir=str(our_dir),
                                                           views=4))
    assert set(ours) == set(theirs) == {"a", "b", "c", "d"}  # deform skipped
    for name in ours:
        assert len(ours[name]) == len(theirs[name]), name
        for o, t in zip(ours[name], theirs[name]):
            assert o["mode"] == t["mode"]
            np.testing.assert_allclose(np.array(o["transformation"]),
                                       np.array(t["transformation"]),
                                       atol=1e-6, err_msg=name)


# ------------------------------------------------- 13. visualizer (tools/)

def test_visualizer_label_mappers_match_reference(ref):
    """A/B the label->color mappers (tools/visualizer.py:7-19,57-86,208-223):
    ins2img (label 0 black), render_label2img / render_gt_label2img /
    render_label2world with partial color_dict / ins_map key coverage."""
    spec = importlib.util.spec_from_file_location(
        "ref_visualizer", REF + "/tools/visualizer.py")
    rv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rv)

    from dmnerf_tpu.utils import viz

    rng = np.random.default_rng(21)
    K = 7
    rgbs = rng.integers(0, 256, (K, 3)).astype(np.float64)
    labels = rng.integers(0, K, (9, 11))
    # partial mappings: one label has no ins_map entry, one gt label no color
    ins_map = {str(l): int((l + 2) % K) for l in range(K - 1)}
    color_dict = {str(g): int((g * 3 + 1) % K) for g in range(K)}
    del color_dict[str((0 + 2) % K + 1)]
    color_dict.setdefault(str((0 + 2) % K), (0 + 2) % K)  # keep ins_map[0] valid
    # drop mapped-to gt labels that lost their color_dict entry from ins_map
    ins_map = {k: v for k, v in ins_map.items() if str(v) in color_dict}

    t_labels = torch.from_numpy(labels)
    np.testing.assert_array_equal(
        viz.render_label2img(labels, rgbs, color_dict, ins_map),
        rv.render_label2img(t_labels, rgbs, color_dict, ins_map))
    np.testing.assert_array_equal(
        viz.render_gt_label2img(labels, rgbs, color_dict),
        rv.render_gt_label2img(t_labels, rgbs, color_dict))

    flat = labels.reshape(-1)
    np.testing.assert_array_equal(
        viz.render_label2world(flat, rgbs, color_dict, ins_map),
        rv.render_label2world(torch.from_numpy(flat), rgbs, color_dict,
                              ins_map))

    probs = rng.uniform(0, 1, (9, 11, K))
    np.testing.assert_array_equal(
        viz.ins2img(probs, rgbs),
        rv.ins2img(torch.from_numpy(probs), rgbs))


# ------------------------------------- 14. full manipulator two-pass pipeline

def test_manipulator_pipeline_matches_reference(ref, monkeypatch):
    """A/B the ENTIRE two-pass edit pipeline (manipulator.py:137-205) — coarse
    fields on ori+tar rays, fine accumulated labels, exchanger, re-composite,
    importance-resample, fine pass on the z union, second exchange, final
    composite — with copied weights, 2 moved objects. The reference calls
    sample_pdf stochastically (det defaults False) even at eval; both sides
    are pinned to the deterministic path for the comparison. f32 (the
    reference hard-casts viewdirs, manipulator.py:112), tol 2e-4."""
    from dmnerf_tpu.edit.manipulator import manipulate_chunk
    from dmnerf_tpu.models.fields import apply_field, init_field_params

    cfg = small_cfg(jnp.float32, w=64, ins_num=6, multires=4, multires_views=2)
    kc, kf = jax.random.split(jax.random.PRNGKey(3))
    params = {"coarse": init_field_params(kc, cfg, scheme="torch"),
              "fine": init_field_params(kf, cfg, scheme="torch")}

    rng = np.random.default_rng(7)
    n, n_obj = 16, 2
    ori_o, ori_d = rand_rays(rng, n)
    tar_rays_np = [rand_rays(rng, n) for _ in range(n_obj)]
    move_labels = [1, 3]
    n_samples, n_importance, near, far = 8, 8, 0.5, 4.0

    # ---- reference side
    monkeypatch.setattr(ref.mani, "sample_pdf",
                        lambda b, w, s: ref.hp.sample_pdf(b, w, s, det=True))
    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    model_c = torch_model_from_params(ref, params["coarse"], cfg)
    model_f = torch_model_from_params(ref, params["fine"], cfg)
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    r_args = types.SimpleNamespace(N_samples=n_samples,
                                   N_importance=n_importance,
                                   near=near, far=far,
                                   target_labels=move_labels)
    with torch.no_grad():
        f_rgb, f_ins, _, _ = ref.mani.manipulator(
            pe, ve, model_c, model_f, (t(ori_o), t(ori_d)),
            [(t(o), t(d)) for (o, d) in tar_rays_np], r_args)

    # ---- our side (XLA field path, literal composite)
    coarse_fn = lambda pts, vd: apply_field(params["coarse"], cfg, pts, vd)
    fine_fn = lambda pts, vd: apply_field(params["fine"], cfg, pts, vd)
    rgb, ins, _, _ = manipulate_chunk(
        coarse_fn, fine_fn,
        (jnp.asarray(ori_o), jnp.asarray(ori_d)),
        [(jnp.asarray(o), jnp.asarray(d)) for (o, d) in tar_rays_np],
        move_labels, n_samples, n_importance, near, far)

    np.testing.assert_allclose(np.asarray(rgb), f_rgb.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ins), f_ins.numpy(), atol=2e-4)


# ------------------------------------------- 15. full render_test pipeline

@pytest.mark.parametrize("crop,via_ckpt", [(False, False), (True, False),
                                           (False, True)])
def test_render_test_full_pipeline(ref, tmp_path, monkeypatch, crop,
                                   via_ckpt):
    """A/B the reference's ENTIRE test-rendering entry (tester.py:17-162) —
    chunked full-image render, per-view metrics, ins_eval + matching map,
    png/json/txt artifacts — against eval/tester.py with copied weights.

    The reference's module-level heavy deps are satisfied as: lpips -> a
    0-returning fake (our column is NaN by gating; col 2 excluded), skimage
    .metrics -> OUR psnr/ssim (identical on both sides by construction, so the
    columns compare the *pipeline* — chunk stitching, crop, view pairing, mean
    row — not the metric impls, which have their own oracle tests). cv2 and
    imageio are real, so the reference writes its actual artifacts; its
    cv2-written instance pngs are BGR on disk (PARITY.md) and are compared
    channel-reversed. The ins head is sharpened (x20 logits) so per-pixel
    argmax labels are identical despite torch-vs-JAX f32 noise in an untrained
    net; AP columns and matching_log.json must then match EXACTLY."""
    import json as _json

    import dmnerf_tpu.eval.metrics as our_metrics
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.eval.tester import render_test as our_render_test
    from dmnerf_tpu.models.fields import init_field_params

    # functional stubs (the module fixture registered empty ones)
    sk = sys.modules.get("skimage.metrics")
    if sk is not None and not hasattr(sk, "peak_signal_noise_ratio"):
        sk.peak_signal_noise_ratio = \
            lambda img, gt, data_range=1: our_metrics.psnr(img, gt, data_range)
        sk.structural_similarity = \
            lambda img, gt, multichannel=True, data_range=1: \
                our_metrics.ssim(img, gt, data_range)
    lp = sys.modules.get("lpips")
    if lp is not None and not hasattr(lp, "LPIPS"):
        class _FakeLPIPS:
            def __init__(self, net="vgg"):
                pass

            def to(self, device):
                return self

            def __call__(self, a, b):
                return torch.tensor(0.0)
        lp.LPIPS = _FakeLPIPS

    import networks.tester as r_test

    if crop:
        # ScanNet flavor: label 0 -> unlabeled (=ins_num), 12x12 center crop;
        # exercises tester.py:25-40 (gt cropping), :78-82 (render crop) and
        # the masked unique[:-1] ins_eval branch (:99-107)
        from dmnerf_tpu.data.synthetic import make_scene_crop
        scene = make_scene_crop(H=16, W=16, n_train=1, n_test=2)
        ch = cw = 12
    else:
        scene = make_scene(H=16, W=16, n_train=1, n_test=2)
        ch = cw = None
    cfg = small_cfg(jnp.float32, w=64, ins_num=scene.ins_num,
                    multires=4, multires_views=2)
    kc, kf = jax.random.split(jax.random.PRNGKey(11))

    def sharpen(p, s=20.0):
        p = dict(p)
        p["ins_out"] = {"w": p["ins_out"]["w"] * s, "b": p["ins_out"]["b"] * s}
        return p

    params = {"coarse": sharpen(init_field_params(kc, cfg, scheme="torch")),
              "fine": sharpen(init_field_params(kf, cfg, scheme="torch"))}
    sel = scene.i_test
    H, W, K = scene.hwk

    # ---- reference side (cwd provides ./data/color_dict.json)
    monkeypatch.chdir(tmp_path)
    (tmp_path / "data").mkdir()
    cd = {str(l): int(l) for l in range(scene.ins_num)}
    with open(tmp_path / "data" / "color_dict.json", "w") as f:
        _json.dump({"dmsr": {"synthetic": cd}}, f)
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    model_c = torch_model_from_params(ref, params["coarse"], cfg)
    model_f = torch_model_from_params(ref, params["fine"], cfg)
    r_args = types.SimpleNamespace(
        datadir="./data/dmsr/synthetic", device="cpu", ins_num=scene.ins_num,
        N_test=100, near=1.0, far=12.0, N_samples=8, N_importance=8,
        perturb=0.0, is_train=False, N_ins=None,
        crop_height=ch, crop_width=cw)
    cm_t = torch.from_numpy(np.asarray(scene.crop_mask)) if crop else None
    with torch.no_grad():
        r_test.render_test(pe, ve, model_c, model_f,
                           np.asarray(scene.poses[sel]),
                           (H, W, torch.from_numpy(np.asarray(K)).float()),
                           r_args,
                           gt_imgs=torch.from_numpy(scene.images[sel]).float(),
                           gt_labels=torch.from_numpy(
                               scene.gt_labels[sel].astype(np.int64)),
                           ins_rgbs=scene.ins_rgbs, savedir=str(ref_dir),
                           crop_mask=cm_t)

    # ---- our side
    args = default_config(N_test=100, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=cfg.netdepth, netwidth=cfg.netwidth,
                          multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    args.crop_height, args.crop_width = ch, cw
    if via_ckpt:
        # Same artifact-exact A/B, but our params arrive through the FULL
        # migration path: torch.save of the reference's own checkpoint blob
        # (train_dmsr.py:78-86) -> tools/import_torch_ckpt.py -> orbax
        # restore (the identical load path cli.test uses)
        import os as _os
        tools_dir = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "tools")
        if tools_dir not in sys.path:
            sys.path.insert(0, tools_dir)
        from import_torch_ckpt import import_checkpoint

        from dmnerf_tpu.train.checkpoint import restore_checkpoint
        from dmnerf_tpu.train.step import create_train_state
        tar = tmp_path / "100000.tar"
        torch.save({"iteration": 100000,
                    "network_coarse_state_dict": model_c.state_dict(),
                    "network_fine_state_dict": model_f.state_dict(),
                    "optimizer_state_dict": {}}, str(tar))
        args.ins_num = None  # the tool must infer it from the ins head
        out = import_checkpoint(str(tar), args, out_dir=str(tmp_path / "imp"))
        assert args.ins_num == scene.ins_num
        template = create_train_state(jax.random.PRNGKey(0), cfg,
                                      args.lrate, args.lrate_decay)
        params = restore_checkpoint(out, template).params
    render_im = make_image_renderer(cfg, args, H, W, fused=False)
    our_render_test(render_im, params, scene.poses[sel], scene.hwk, args,
                    gt_imgs=scene.images[sel], gt_labels=scene.gt_labels[sel],
                    ins_rgbs=scene.ins_rgbs, savedir=str(our_dir),
                    crop_mask=scene.crop_mask if crop else None)

    # ---- artifacts
    t_ref = np.loadtxt(ref_dir / "test_results.txt")
    t_our = np.loadtxt(our_dir / "test_results.txt")
    assert t_ref.shape == t_our.shape == (3, 9)
    np.testing.assert_allclose(t_our[:, :2], t_ref[:, :2], atol=2e-3)
    np.testing.assert_array_equal(t_our[:, 3:], t_ref[:, 3:])  # APs exact

    with open(ref_dir / "matching_log.json") as f:
        m_ref = _json.load(f)
    with open(our_dir / "matching_log.json") as f:
        m_our = _json.load(f)
    assert m_our == m_ref

    import imageio.v2 as iio
    for i in range(len(sel)):
        rgb_r = iio.imread(ref_dir / f"{i:03d}.png").astype(np.int16)
        rgb_o = iio.imread(our_dir / f"{i:03d}.png").astype(np.int16)
        assert np.abs(rgb_r - rgb_o).max() <= 1  # to8b rounding on f32 noise
        # cv2-written artifacts are BGR on disk; ours mean RGB
        ins_r = iio.imread(ref_dir / f"instance_{i:03d}.png")
        ins_o = iio.imread(our_dir / f"instance_{i:03d}.png")
        np.testing.assert_array_equal(ins_o, ins_r[..., ::-1])
        gt_r = iio.imread(ref_dir / f"{i}_ins_gt.png")
        gt_o = iio.imread(our_dir / f"{i}_ins_gt.png")
        np.testing.assert_array_equal(gt_o, gt_r[..., ::-1])
        np.testing.assert_array_equal(
            iio.imread(our_dir / f"{i}_ins_gt_mask.png"),
            iio.imread(ref_dir / f"{i}_ins_gt_mask.png"))


# -------------------------------------- 16. full manipulator_eval pipeline

def test_manipulator_eval_full_pipeline(ref, tmp_path, monkeypatch):
    """A/B the reference's ENTIRE manipulation-eval entry (manipulator.py:
    208-364) — per-view two-pass whole-image edit, PSNR/SSIM vs GT renders,
    ins_eval on the edited instance map, matching_log.json + test_results.txt
    + png artifacts — against edit/runner.py::manipulator_eval with copied
    weights. Same stubbing scheme as the render_test A/B (surface 15); the
    reference's stochastic sample_pdf is det-pinned as in surface 14. The
    scene's own test images serve as the 'GT manipulated renders' — the
    pipeline comparison is invariant to what the GT actually depicts."""
    import json as _json

    import dmnerf_tpu.eval.metrics as our_metrics
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.edit.runner import manipulator_eval as our_mani_eval
    from dmnerf_tpu.models.fields import init_field_params

    sk = sys.modules.get("skimage.metrics")
    if sk is not None and not hasattr(sk, "peak_signal_noise_ratio"):
        sk.peak_signal_noise_ratio = \
            lambda img, gt, data_range=1: our_metrics.psnr(img, gt, data_range)
        sk.structural_similarity = \
            lambda img, gt, multichannel=True, data_range=1: \
                our_metrics.ssim(img, gt, data_range)
    lp = sys.modules.get("lpips")
    if lp is not None and not hasattr(lp, "LPIPS"):
        class _FakeLPIPS:
            def __init__(self, net="vgg"):
                pass

            def to(self, device):
                return self

            def __call__(self, a, b):
                return torch.tensor(0.0)
        lp.LPIPS = _FakeLPIPS

    monkeypatch.setattr(ref.mani, "sample_pdf",
                        lambda b, w, s: ref.hp.sample_pdf(b, w, s, det=True))

    scene = make_scene(H=16, W=16, n_train=1, n_test=2)
    cfg = small_cfg(jnp.float32, w=64, ins_num=scene.ins_num,
                    multires=4, multires_views=2)
    kc, kf = jax.random.split(jax.random.PRNGKey(13))

    def sharpen(p, s=20.0):
        p = dict(p)
        p["ins_out"] = {"w": p["ins_out"]["w"] * s, "b": p["ins_out"]["b"] * s}
        return p

    params = {"coarse": sharpen(init_field_params(kc, cfg, scheme="torch")),
              "fine": sharpen(init_field_params(kf, cfg, scheme="torch"))}
    sel = scene.i_test
    H, W, K = scene.hwk

    trans = np.eye(4)
    trans[:3, 3] = [0.4, -0.2, 0.1]
    trans_dicts = {"transformations": [
        {"transformation": trans.tolist(), "mode": "translation"}]}

    monkeypatch.chdir(tmp_path)
    (tmp_path / "data").mkdir()
    cd = {str(l): int(l) for l in range(scene.ins_num)}
    with open(tmp_path / "data" / "color_dict.json", "w") as f:
        _json.dump({"dmsr": {"synthetic": cd}}, f)
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    model_c = torch_model_from_params(ref, params["coarse"], cfg)
    model_f = torch_model_from_params(ref, params["fine"], cfg)
    r_args = types.SimpleNamespace(
        datadir="./data/dmsr/synthetic", device="cpu", ins_num=scene.ins_num,
        N_test=100, near=1.0, far=12.0, N_samples=8, N_importance=8,
        target_label=1)
    with torch.no_grad():
        ref.mani.manipulator_eval(
            pe, ve, model_c, model_f, np.asarray(scene.poses[sel]),
            (H, W, torch.from_numpy(np.asarray(K)).float()),
            trans_dicts, str(ref_dir), scene.ins_rgbs, r_args,
            gt_rgbs=torch.from_numpy(scene.images[sel]).float(),
            gt_labels=torch.from_numpy(scene.gt_labels[sel].astype(np.int64)))

    args = default_config(N_test=100, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=cfg.netdepth, netwidth=cfg.netwidth,
                          multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    args.target_label = 1
    our_mani_eval(cfg, params, scene.poses[sel], scene.hwk, trans_dicts,
                  str(our_dir), scene.ins_rgbs, args,
                  gt_rgbs=scene.images[sel], gt_labels=scene.gt_labels[sel])

    t_ref = np.loadtxt(ref_dir / "translation" / "test_results.txt")
    t_our = np.loadtxt(our_dir / "translation" / "test_results.txt")
    assert t_ref.shape == t_our.shape == (3, 9)
    np.testing.assert_allclose(t_our[:, :2], t_ref[:, :2], atol=2e-3)
    np.testing.assert_array_equal(t_our[:, 3:], t_ref[:, 3:])  # APs exact

    with open(ref_dir / "translation" / "matching_log.json") as f:
        m_ref = _json.load(f)
    with open(our_dir / "translation" / "matching_log.json") as f:
        m_our = _json.load(f)
    assert m_our == m_ref

    import imageio.v2 as iio
    for i in range(len(sel)):
        rgb_r = iio.imread(ref_dir / "translation" / f"{i}_rgb.png").astype(np.int16)
        rgb_o = iio.imread(our_dir / "translation" / f"{i}_rgb.png").astype(np.int16)
        assert np.abs(rgb_r - rgb_o).max() <= 1
        ins_r = iio.imread(ref_dir / "translation" / f"{i}_ins.png")
        ins_o = iio.imread(our_dir / "translation" / f"{i}_ins.png")
        np.testing.assert_array_equal(ins_o, ins_r[..., ::-1])
        gt_r = iio.imread(ref_dir / "translation" / f"{i}_ins_gt.png")
        gt_o = iio.imread(our_dir / "translation" / f"{i}_ins_gt.png")
        np.testing.assert_array_equal(gt_o, gt_r[..., ::-1])
        np.testing.assert_array_equal(
            iio.imread(our_dir / "translation" / f"{i}_rgb_gt.png"),
            iio.imread(ref_dir / "translation" / f"{i}_rgb_gt.png"))


# -------------------------------------- 17. full manipulator_demo pipeline

@pytest.mark.parametrize("mode", ["rigid", "deform"])
def test_manipulator_demo_full_pipeline(ref, tmp_path, monkeypatch, mode):
    """A/B the reference's ENTIRE multi-object demo entry (manipulator.py:
    367-491) — per-view 2-object edit, rigid flavor (per-view transformation
    sequences) and deform flavor (sin + ln per-pixel-row ray shifts; sin is
    scaled by the hardcoded deform_v oscillation — view 0 exercises the
    deform_v[0] == 0 degenerate shift, view 1 the 0.18 peak). Artifacts
    ({i}_rgb.png, {i}_ins.png BGR-reversed, {i}_ins_pred_mask.png) compared
    pixel-exact (rgb within one uint8 LSB).

    The flavors are separate runs because the reference CANNOT mix them: its
    rigid tar rays are [H,W,3] while deform tar rays are pre-flattened
    [H*W,3], so torch.stack at manipulator.py:438 raises on any mixed objs
    list (none of its shipped demo configs mix). Our manipulator_demo handles
    mixed rigid+deform objs (tests/test_edit_runner.py) — documented
    deviation, PARITY.md."""
    import json as _json

    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.edit.runner import manipulator_demo as our_mani_demo
    from dmnerf_tpu.models.fields import init_field_params

    monkeypatch.setattr(ref.mani, "sample_pdf",
                        lambda b, w, s: ref.hp.sample_pdf(b, w, s, det=True))

    scene = make_scene(H=16, W=16, n_train=1, n_test=2)
    cfg = small_cfg(jnp.float32, w=64, ins_num=scene.ins_num,
                    multires=4, multires_views=2)
    kc, kf = jax.random.split(jax.random.PRNGKey(17))

    def sharpen(p, s=20.0):
        p = dict(p)
        p["ins_out"] = {"w": p["ins_out"]["w"] * s, "b": p["ins_out"]["b"] * s}
        return p

    params = {"coarse": sharpen(init_field_params(kc, cfg, scheme="torch")),
              "fine": sharpen(init_field_params(kf, cfg, scheme="torch"))}
    H, W, K = scene.hwk
    view_poses = np.asarray(scene.poses[scene.i_test])

    if mode == "rigid":
        t0 = np.eye(4); t0[:3, 3] = [0.3, 0.0, 0.0]
        t1 = np.eye(4); t1[:3, 3] = [0.6, -0.1, 0.0]
        s0 = np.eye(4); s0[:3, 3] = [0.0, 0.2, 0.0]
        s1 = np.eye(4); s1[:3, 3] = [0.0, 0.4, 0.1]
        objs_trans = {"chair": [{"transformation": t0.tolist()},
                                {"transformation": t1.tolist()}],
                      "table": [{"transformation": s0.tolist()},
                                {"transformation": s1.tolist()}]}
        objs = [{"obj_name": "chair", "tar_id": 1, "mani_mode": "rigid"},
                {"obj_name": "table", "tar_id": 2, "mani_mode": "rigid"}]
    else:
        objs_trans = {}
        objs = [{"obj_name": "wave", "tar_id": 1, "mani_mode": "deform",
                 "deform_func": "sin"},
                {"obj_name": "bend", "tar_id": 2, "mani_mode": "deform",
                 "deform_func": "ln"}]
    ins_map = {"1": 1, "2": 2}

    monkeypatch.chdir(tmp_path)
    (tmp_path / "data").mkdir()
    cd = {str(l): int(l) for l in range(scene.ins_num)}
    with open(tmp_path / "data" / "color_dict.json", "w") as f:
        _json.dump({"dmsr": {"synthetic": cd}}, f)
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    model_c = torch_model_from_params(ref, params["coarse"], cfg)
    model_f = torch_model_from_params(ref, params["fine"], cfg)
    r_args = types.SimpleNamespace(
        datadir="./data/dmsr/synthetic", device="cpu", ins_num=scene.ins_num,
        N_test=100, near=1.0, far=12.0, N_samples=8, N_importance=8,
        mani_type="demo")
    with torch.no_grad():
        ref.mani.manipulator_demo(
            pe, ve, model_c, model_f, view_poses,
            (H, W, torch.from_numpy(np.asarray(K)).float()),
            objs_trans, str(ref_dir), scene.ins_rgbs, objs, view_poses,
            ins_map, r_args)

    args = default_config(N_test=100, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, precision="f32",
                          netdepth=cfg.netdepth, netwidth=cfg.netwidth,
                          multires=4, multires_views=2)
    args.ins_num = scene.ins_num
    args.mani_type = "demo"
    our_mani_demo(cfg, params, scene.hwk, objs_trans, str(our_dir),
                  scene.ins_rgbs, objs, view_poses, ins_map, args)

    import imageio.v2 as iio
    for i in range(len(view_poses)):
        rgb_r = iio.imread(ref_dir / "demo" / f"{i}_rgb.png").astype(np.int16)
        rgb_o = iio.imread(our_dir / "demo" / f"{i}_rgb.png").astype(np.int16)
        assert np.abs(rgb_r - rgb_o).max() <= 1
        ins_r = iio.imread(ref_dir / "demo" / f"{i}_ins.png")
        ins_o = iio.imread(our_dir / "demo" / f"{i}_ins.png")
        np.testing.assert_array_equal(ins_o, ins_r[..., ::-1])
        np.testing.assert_array_equal(
            iio.imread(our_dir / "demo" / f"{i}_ins_pred_mask.png"),
            iio.imread(ref_dir / "demo" / f"{i}_ins_pred_mask.png"))


# ------------------------------------ 18. optimizer chain (Adam + LR decay)

def test_optimizer_chain_matches_reference(ref):
    """A/B our optax optimizer chain against the reference's torch.optim.Adam
    + manual exp LR decay (train_dmsr.py:125, :66-73), the one train-path
    stage not covered by surfaces 1-7: K steps over an identical gradient
    sequence, f64.

    Part 1 pins Adam mechanics at constant lr (tol 1e-12). Part 2 pins the
    schedule law lr(i) = lrate * 0.1^(i / (lrate_decay*1000)). Part 3 runs the
    combined trajectory at a decay fast enough to matter within 10 steps.
    NOTE the reference applies the decay AFTER stepping, so its step i uses
    lr(i-1) — a one-step lag, relative lr offset 0.1^(1/D) (4.6e-6 at the
    shipped D=500k; harmless). Our schedule uses lr(i) at step i; part 3
    replicates the lag on the torch side and compares against our chain fed
    the SAME effective sequence, plus documents the deviation bound."""
    import optax
    from dmnerf_tpu.train.schedule import exp_decay_schedule
    from dmnerf_tpu.train.step import make_optimizer

    rng = np.random.default_rng(23)
    shapes = [(7, 5), (5,), (3, 7)]
    n_steps = 10
    grads_seq = [[rng.normal(size=s) for s in shapes] for _ in range(n_steps)]
    init = [rng.normal(size=s) for s in shapes]

    # ---- part 1: Adam mechanics, constant lr
    lr = 5e-3
    with torch_f64():
        t_params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
        opt = torch.optim.Adam(t_params, lr=lr, betas=(0.9, 0.999))
        for g in grads_seq:
            opt.zero_grad()
            for p, gv in zip(t_params, g):
                p.grad = torch.from_numpy(gv.copy())
            opt.step()

    with jax.enable_x64(True):
        j_params = [jnp.asarray(p) for p in init]
        tx = optax.adam(lr, b1=0.9, b2=0.999)
        st = tx.init(j_params)
        for g in grads_seq:
            upd, st = tx.update([jnp.asarray(gv) for gv in g], st, j_params)
            j_params = optax.apply_updates(j_params, upd)
    for jp, tp in zip(j_params, t_params):
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   rtol=1e-12, atol=1e-12)

    # ---- part 2: schedule law (train_dmsr.py:68-70)
    lrate, lrate_decay = 5e-4, 500
    sched = exp_decay_schedule(lrate, lrate_decay)
    for i in [0, 1, 100, 10_000, 500_000]:
        expect = lrate * (0.1 ** (i / (lrate_decay * 1000)))
        np.testing.assert_allclose(float(sched(i)), expect, rtol=1e-6)

    # ---- part 3: combined trajectory, fast decay (D=100 so it matters)
    lrate, decay_k = 5e-3, 0.0001  # decay_steps = 0.1 -> visible per step
    # reference loop: step with current lr, THEN set lr = lrate*0.1^(i/D)
    D = 100.0
    with torch_f64():
        t_params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
        opt = torch.optim.Adam(t_params, lr=lrate, betas=(0.9, 0.999))
        for i, g in enumerate(grads_seq):
            opt.zero_grad()
            for p, gv in zip(t_params, g):
                p.grad = torch.from_numpy(gv.copy())
            opt.step()
            for group in opt.param_groups:
                group["lr"] = lrate * (0.1 ** (i / D))

    # our chain with the reference's EFFECTIVE sequence lr(max(i-1,0))
    ref_lr = lambda i: lrate * (0.1 ** (max(i - 1, 0) / D))
    with jax.enable_x64(True):
        tx = optax.adam(lambda i: ref_lr(int(i)), b1=0.9, b2=0.999)
        j_params = [jnp.asarray(p) for p in init]
        st = tx.init(j_params)
        for g in grads_seq:
            upd, st = tx.update([jnp.asarray(gv) for gv in g], st, j_params)
            j_params = optax.apply_updates(j_params, upd)
    for jp, tp in zip(j_params, t_params):
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   rtol=1e-10, atol=1e-10)

    # the lag's worst-case relative lr offset at the shipped decay constants
    assert abs(1.0 - 0.1 ** (1 / 500_000.0)) < 5e-6


# ------------------------------------ 19. mesh_main's NN-query stages

def test_mesh_query_stages_match_reference(ref):
    """A/B the mesh generator's A/B-able stages (mesh_generator.py:12-143).
    mesh_main itself cannot run here (trimesh/skimage/open3d do its actual
    isosurface geometry and are absent — our own marching cubes/cleanup are
    validated on analytic surfaces in test_mesh.py), but its NN-query stages
    and the grid builder are the reference's own code:

      (a) grid_within_bound / make_3D_grid (tools/visualizer.py:111-155) with
          a fabricated oriented-bounds transform — grid points + scene scale;
      (b) the chunked density query with ZERO viewdirs + occupancy transform
          occ = 1-exp(-relu(sigma) * (far-near)/N_importance)
          (mesh_generator.py:36-66) on the axis-swapped grid;
      (c) the vertex-coloring ray march (mesh_generator.py:105-137): rays
          from fabricated vertices/normals (the reference's axis swaps and
          -0.03*near offset applied identically), full dm_nerf with the FIXED
          near=0.01/far=15 z law, per-vertex argmax labels — exact equality
          with a sharpened ins head."""
    from dmnerf_tpu.mesh.extract import make_density_fn, make_label_fn
    from dmnerf_tpu.mesh.grid import grid_within_bound
    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.models.fields import init_field_params

    spec = importlib.util.spec_from_file_location(
        "ref_visualizer", REF + "/tools/visualizer.py")
    rv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rv)

    rng = np.random.default_rng(29)

    # ---- (a) grid builder with a fabricated scene transform
    th = 0.37
    T = np.eye(4)
    T[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0],
                          [0, 0, 1.0]])
    T[:3, 3] = [0.3, -1.2, 0.8]
    extents = np.array([1.9, 7.0, 7.0])
    dim = 8
    g_ref, s_ref = rv.grid_within_bound([-1.0, 1.0], extents, T, grid_dim=dim)
    g_our, s_our = grid_within_bound([-1.0, 1.0], extents, T, dim)
    np.testing.assert_allclose(g_our, g_ref.view(-1, 3).numpy(), atol=1e-5)
    np.testing.assert_allclose(s_our, s_ref.numpy(), atol=1e-6)

    # ---- shared model
    cfg = small_cfg(jnp.float32, w=64, ins_num=6, multires=4, multires_views=2)
    kc, kf = jax.random.split(jax.random.PRNGKey(19))

    def sharpen(p, s=20.0):
        p = dict(p)
        p["ins_out"] = {"w": p["ins_out"]["w"] * s, "b": p["ins_out"]["b"] * s}
        return p

    params = {"coarse": sharpen(init_field_params(kc, cfg, scheme="torch")),
              "fine": sharpen(init_field_params(kf, cfg, scheme="torch"))}
    pe, _ = ref.dm.get_embedder(cfg.multires)
    ve, _ = ref.dm.get_embedder(cfg.multires_views)
    model_c = torch_model_from_params(ref, params["coarse"], cfg)
    model_f = torch_model_from_params(ref, params["fine"], cfg)

    # ---- (b) density -> occupancy on the axis-swapped grid
    q = np.asarray(g_ref.view(-1, 3).numpy())[:, [0, 2, 1]].copy()
    q[:, 1] *= -1
    near, far, n_imp = 1.0, 12.0, 8
    with torch.no_grad():
        pts_t = torch.from_numpy(q.astype(np.float32))
        emb = torch.cat([pe.embed(pts_t), ve.embed(torch.zeros_like(pts_t))], -1)
        raw_ref = model_f(emb)
        voxel = (far - near) / n_imp
        occ_ref = (1.0 - torch.exp(-torch.relu(raw_ref[..., 3]) * voxel)).numpy()
    density = make_density_fn(cfg, chunk=64)(params["fine"], q.astype(np.float32))
    occ_our = 1.0 - np.exp(-np.maximum(density, 0.0) * voxel)
    np.testing.assert_allclose(occ_our, occ_ref, atol=2e-5)

    # ---- (c) vertex-coloring labels
    n_v = 50
    verts = rng.uniform(-2, 2, (n_v, 3)).astype(np.float32)
    normals = rng.normal(size=(n_v, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    # reference's swaps + offset (mesh_generator.py:106-118)
    rd = -normals[:, [0, 2, 1]].copy()
    rd[:, 1] *= -1
    v_sw = verts[:, [0, 2, 1]].copy()
    v_sw[:, 1] *= -1
    ro = v_sw - rd * 0.03 * near

    r_args = types.SimpleNamespace(N_samples=8, N_importance=n_imp,
                                   perturb=0.0, is_train=False, N_ins=None)
    chunk = 32
    full_ins = None
    with torch.no_grad():
        for step in range(0, n_v, chunk):
            n_c = min(chunk, n_v - step)
            z = ref.hp.z_val_sample(n_c, 0.01, 15, 8)
            batch = torch.stack([torch.from_numpy(ro[step:step + n_c]),
                                 torch.from_numpy(rd[step:step + n_c])], 0)
            info = ref.render.dm_nerf(batch, pe, ve, model_c, model_f, z, r_args)
            ins = info["ins_fine"]
            full_ins = ins if full_ins is None else torch.cat([full_ins, ins], 0)
    labels_ref = torch.argmax(full_ins, -1).numpy()

    args = default_config(N_samples=8, N_importance=n_imp, near=near, far=far,
                          precision="f32", netdepth=cfg.netdepth,
                          netwidth=cfg.netwidth, multires=4, multires_views=2)
    args.use_pallas = False
    labels_our = make_label_fn(cfg, args, chunk=32, use_fused=False)(
        params, ro, rd)
    np.testing.assert_array_equal(labels_our, labels_ref)
