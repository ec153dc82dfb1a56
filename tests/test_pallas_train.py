"""Trainable fused Pallas field: forward AND gradients vs the XLA path
(interpret mode on CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.models.fields import FieldConfig, apply_field, init_field_params
from dmnerf_tpu.ops.pallas.field_kernels import make_trainable_pallas_field

CFG = FieldConfig(netdepth=3, netwidth=32, multires=3, multires_views=2,
                  ins_num=3, skip=1, compute_dtype=jnp.float32)


def _setup():
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    R, S = 2, 4
    pts = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32))
    dirs = rng.normal(size=(R, 1, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, pts, jnp.asarray(dirs)


def test_forward_matches_xla():
    params, pts, dirs = _setup()
    field = make_trainable_pallas_field(CFG)
    got = field(params, pts, dirs)
    want = apply_field(params, CFG, pts, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)


def test_param_grads_match_xla():
    params, pts, dirs = _setup()
    field = make_trainable_pallas_field(CFG)

    def loss_pallas(p):
        raw = field(p, pts, dirs)
        return jnp.sum(jnp.sin(raw) * jnp.arange(raw.shape[-1]))

    def loss_xla(p):
        raw = apply_field(p, CFG, pts, dirs)
        return jnp.sum(jnp.sin(raw) * jnp.arange(raw.shape[-1]))

    g_p = jax.grad(loss_pallas)(params)
    g_x = jax.grad(loss_xla)(params)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_x = jax.tree_util.tree_leaves(g_x)
    for (path, a), b in zip(flat_p, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_ins_branch_detached_in_pallas_backward():
    """dm_nerf.py:95 parity: instance-output gradients must not reach the trunk."""
    params, pts, dirs = _setup()
    field = make_trainable_pallas_field(CFG)

    def ins_sum(p):
        raw = field(p, pts, dirs)
        return jnp.sum(raw[..., 4:])

    g = jax.grad(ins_sum)(params)
    trunk_g = sum(float(jnp.abs(l["w"]).sum()) for l in g["trunk"])
    assert trunk_g == 0.0
    assert float(jnp.abs(g["ins_out"]["w"]).sum()) > 0.0


def test_pts_grads_match_xla():
    params, pts, dirs = _setup()
    field = make_trainable_pallas_field(CFG)

    def f_pallas(q):
        return jnp.sum(field(params, q, dirs) ** 2)

    def f_xla(q):
        return jnp.sum(apply_field(params, CFG, q, dirs) ** 2)

    g_p = jax.grad(f_pallas)(pts)
    g_x = jax.grad(f_xla)(pts)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=5e-3, rtol=5e-3)


@pytest.mark.slow
def test_pallas_field_sharded_matches_single(monkeypatch):
    """shard_map'd kernel on an 8-device mesh: forward and param grads match
    the unsharded kernel (weights replicated in -> grad psum via the shard_map
    transpose). Small tiles keep interpret mode fast."""
    from dmnerf_tpu.ops.pallas import field_kernels
    from dmnerf_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    monkeypatch.setattr(field_kernels, "TILE_FWD", 8)
    monkeypatch.setattr(field_kernels, "TILE_BWD", 8)

    params, pts, dirs = _setup()  # R=2, S=4 -> 8 pts -> 1 pt/shard... pad to 64
    mesh = make_mesh()
    f1 = make_trainable_pallas_field(CFG)
    f8 = make_trainable_pallas_field(CFG, mesh=mesh)

    def loss(field):
        return lambda p: jnp.sum(jnp.sin(field(p, pts, dirs)))

    out1 = f1(params, pts, dirs)
    out8 = f8(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               atol=1e-5, rtol=1e-5)

    g1 = jax.grad(loss(f1))(params)
    g8 = jax.grad(loss(f8))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g8), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
