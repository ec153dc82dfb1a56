"""Fused Pallas field kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.models.fields import FieldConfig, apply_field, init_field_params
from dmnerf_tpu.ops.pallas.field_kernels import make_pallas_field

CFG = FieldConfig(netdepth=3, netwidth=32, multires=4, multires_views=2,
                  ins_num=4, skip=1, compute_dtype=jnp.float32)


def test_pallas_field_matches_xla():
    params = init_field_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    R, S = 4, 6
    pts = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32))
    dirs = rng.normal(size=(R, 1, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    want = apply_field(params, CFG, pts, dirs)
    field = make_pallas_field(CFG)
    got = field(params, pts, dirs)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)
