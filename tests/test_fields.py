"""DM-NeRF field MLP: wiring (skip, heads, detach) vs a numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.encoding import positional_encoding
from dmnerf_tpu.models.fields import (FieldConfig, apply_field, field_output_dim,
                                      init_field_params, param_count)

CFG = FieldConfig(netdepth=8, netwidth=32, multires=4, multires_views=2,
                  ins_num=5, compute_dtype=jnp.float32)


def numpy_forward(params, cfg, pts, dirs):
    """Independent oracle implementing dm_nerf.py:80-106 semantics in numpy."""
    def lin(x, p):
        return x @ np.asarray(p["w"]) + np.asarray(p["b"])

    x = np.asarray(positional_encoding(jnp.asarray(pts), cfg.multires))
    d = np.asarray(positional_encoding(jnp.asarray(dirs), cfg.multires_views))
    h = x
    for i, layer in enumerate(params["trunk"]):
        h = np.maximum(lin(h, layer), 0.0)
        if i == cfg.skip:
            h = np.concatenate([h, x], -1)
    density = lin(h, params["density"])
    rf = lin(h, params["rgb_feat"])
    rf = np.concatenate([rf, d], -1)
    rf = np.maximum(lin(rf, params["rgb_hidden"]), 0.0)
    rgb = lin(rf, params["rgb_out"])
    insf = lin(h, params["ins_feat"])
    insf = np.maximum(lin(insf, params["ins_hidden"]), 0.0)
    ins = lin(insf, params["ins_out"])
    return np.concatenate([rgb, density, ins], -1)


def test_forward_matches_oracle():
    key = jax.random.PRNGKey(0)
    params = init_field_params(key, CFG)
    pts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    dirs_raw = np.random.default_rng(1).normal(size=(17, 3)).astype(np.float32)
    dirs = dirs_raw / np.linalg.norm(dirs_raw, axis=-1, keepdims=True)
    got = np.asarray(apply_field(params, CFG, jnp.asarray(pts), jnp.asarray(dirs)))
    want = numpy_forward(params, CFG, pts, dirs)
    assert got.shape == (17, field_output_dim(CFG))
    # fp32 matmul reassociation between XLA and numpy
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_param_shapes_and_count():
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    assert len(params["trunk"]) == 8
    # skip layer consumes W + pos_ch
    assert params["trunk"][CFG.skip + 1]["w"].shape[0] == CFG.netwidth + CFG.pos_ch
    assert params["ins_out"]["w"].shape == (CFG.netwidth // 2, CFG.ins_num + 1)
    assert param_count(params) > 0


def test_ins_branch_detached_from_trunk():
    """dm_nerf.py:95 — instance-head gradients must not reach the trunk."""
    params = init_field_params(jax.random.PRNGKey(1), CFG)
    pts = jnp.ones((4, 3)) * 0.3
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))

    def ins_sum(p):
        out = apply_field(p, CFG, pts, dirs)
        return jnp.sum(out[..., 4:])

    g = jax.grad(ins_sum)(params)
    trunk_g = sum(float(jnp.abs(l["w"]).sum() + jnp.abs(l["b"]).sum())
                  for l in g["trunk"])
    assert trunk_g == 0.0
    ins_g = float(jnp.abs(g["ins_out"]["w"]).sum())
    assert ins_g > 0.0

    def rgb_sum(p):
        out = apply_field(p, CFG, pts, dirs)
        return jnp.sum(out[..., :3])

    g2 = jax.grad(rgb_sum)(params)
    trunk_g2 = sum(float(jnp.abs(l["w"]).sum()) for l in g2["trunk"])
    assert trunk_g2 > 0.0


def test_init_statistics():
    cfg = FieldConfig(netwidth=256, ins_num=8)
    # default: He-uniform kernels, U(+-sqrt(6/fan_in))
    params = init_field_params(jax.random.PRNGKey(2), cfg)
    w = np.asarray(params["trunk"][1]["w"])  # fan_in = 256
    he = np.sqrt(6.0 / 256)
    assert w.min() >= -he and w.max() <= he
    assert abs(w.std() - he / np.sqrt(3)) < 0.05 * he
    # torch scheme: U(+-1/sqrt(fan_in)) (reference parity mode)
    params_t = init_field_params(jax.random.PRNGKey(2), cfg, scheme="torch")
    wt = np.asarray(params_t["trunk"][1]["w"])
    bound = 1.0 / np.sqrt(256)
    assert wt.min() >= -bound and wt.max() <= bound
    assert abs(wt.std() - bound / np.sqrt(3)) < 0.05 * bound


def test_init_rejects_skip_at_last_layer():
    """skip == netdepth-1 would concat pos features after the final trunk
    layer, feeding the heads W+pos_ch where they expect W — fail fast instead
    of a shape error deep inside a jit trace."""
    import pytest

    from dmnerf_tpu.models.fields import FieldConfig, init_field_params

    cfg = FieldConfig(netdepth=2, netwidth=32, multires=4, multires_views=2,
                      skip=1, ins_num=4)
    with pytest.raises(ValueError, match="skip"):
        init_field_params(jax.random.PRNGKey(0), cfg)
    # out-of-range skip is the documented no-skip convention for tiny configs
    init_field_params(jax.random.PRNGKey(0),
                      FieldConfig(netdepth=2, netwidth=32, multires=4,
                                  multires_views=2, skip=4, ins_num=4))
