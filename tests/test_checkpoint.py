"""Orbax checkpoint save/restore roundtrip + resume discovery."""

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.checkpoint import (checkpoint_step, latest_checkpoint,
                                         restore_checkpoint, save_checkpoint)
from dmnerf_tpu.train.step import create_train_state

CFG = FieldConfig(netdepth=2, netwidth=16, multires=2, multires_views=1, ins_num=3,
                  compute_dtype=jnp.float32)


def test_roundtrip(tmp_path):
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    path = save_checkpoint(str(tmp_path), state, 1234)
    assert checkpoint_step(path) == 1234

    template = create_train_state(jax.random.PRNGKey(99), CFG)
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    save_checkpoint(str(tmp_path), state, 100)
    save_checkpoint(str(tmp_path), state, 2000)
    save_checkpoint(str(tmp_path), state, 500)
    latest = latest_checkpoint(str(tmp_path))
    assert checkpoint_step(latest) == 2000
