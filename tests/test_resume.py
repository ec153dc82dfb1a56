"""Training resume: save mid-run, restore, continue — step count and params
round-trip (the reference cannot resume at all, SURVEY.md §5)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.config import default_config
from dmnerf_tpu.data.synthetic import make_scene
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                         save_checkpoint)
from dmnerf_tpu.train.step import create_train_state, make_train_step


@pytest.mark.slow
def test_resume_continues_identically(tmp_path):
    scene = make_scene(H=16, W=16, n_train=2, n_test=1)
    args = default_config(N_train=64, N_samples=8, N_importance=8,
                          near=1.0, far=12.0, perturb=0.0, penalize=False, pallas_train=False,
                          precision="f32", netdepth=2, netwidth=32,
                          multires=3, multires_views=2)
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    step_fn = make_train_step(args, cfg)
    arrs = scene.to_device_arrays()

    def run(state, lo, hi):
        for i in range(lo, hi):
            state, m = step_fn(state, arrs, jax.random.PRNGKey(i), jnp.int32(0))
        return state, m

    # straight-through run
    s_a = create_train_state(jax.random.PRNGKey(0), cfg)
    s_a, m_a = run(s_a, 0, 8)

    # interrupted run: 4 steps, checkpoint, restore into a FRESH state, resume
    s_b = create_train_state(jax.random.PRNGKey(0), cfg)
    s_b, _ = run(s_b, 0, 4)
    save_checkpoint(str(tmp_path), s_b, 4)
    ckpt = latest_checkpoint(str(tmp_path))
    fresh = create_train_state(jax.random.PRNGKey(123), cfg)  # different init
    s_c = restore_checkpoint(ckpt, fresh)
    s_c, m_c = run(s_c, 4, 8)

    assert int(s_c.step) == int(s_a.step)
    np.testing.assert_allclose(float(m_c["total_loss"]), float(m_a["total_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
