"""In-graph LAP vs scipy's linear_sum_assignment (the reference's matcher)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from dmnerf_tpu.ops.lap import lap_square


@pytest.mark.parametrize("n", [2, 5, 16, 33])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lap_matches_scipy_cost(n, seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 10, size=(n, n)).astype(np.float32)
    col4row = np.asarray(lap_square(jnp.asarray(cost)))
    # valid permutation
    assert sorted(col4row.tolist()) == list(range(n))
    ours = cost[np.arange(n), col4row].sum()
    r, c = linear_sum_assignment(cost)
    theirs = cost[r, c].sum()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_lap_rectangular_via_constant_padding():
    """Padding invalid rows with a constant preserves the rectangular optimum."""
    rng = np.random.default_rng(3)
    n, valid = 12, 7
    cost = rng.uniform(0, 5, size=(valid, n)).astype(np.float32)
    padded = np.zeros((n, n), np.float32)
    padded[:valid] = cost
    col4row = np.asarray(lap_square(jnp.asarray(padded)))
    ours = cost[np.arange(valid), col4row[:valid]].sum()
    r, c = linear_sum_assignment(cost)
    np.testing.assert_allclose(ours, cost[r, c].sum(), rtol=1e-5)


def test_lap_jit_and_grad_safe():
    cost = jnp.asarray(np.random.default_rng(0).uniform(size=(8, 8)), jnp.float32)
    out = jax.jit(lap_square)(cost)
    assert out.shape == (8,)
