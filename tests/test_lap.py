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


@pytest.mark.parametrize("n,valid", [(12, 7), (33, 1), (33, 33), (16, 0), (8, 3)])
def test_lap_n_valid_matches_scipy(n, valid):
    """n_valid skips padding-row phases; optimum over valid rows must be exact
    and the output must still be a permutation."""
    rng = np.random.default_rng(n * 100 + valid)
    cost = rng.uniform(0, 5, size=(n, n)).astype(np.float32)
    # garbage in padding rows must be ignored
    cost[valid:] = rng.uniform(-50, 50, size=(n - valid, n))
    col4row = np.asarray(lap_square(jnp.asarray(cost), valid))
    assert sorted(col4row.tolist()) == list(range(n))
    if valid:
        ours = cost[np.arange(valid), col4row[:valid]].sum()
        r, c = linear_sum_assignment(cost[:valid])
        np.testing.assert_allclose(ours, cost[:valid][r, c].sum(), rtol=1e-5)


def test_lap_n_valid_traced():
    """n_valid as a traced scalar under jit (how the train step passes it)."""
    rng = np.random.default_rng(7)
    cost = rng.uniform(0, 5, size=(10, 10)).astype(np.float32)
    f = jax.jit(lambda c, nv: lap_square(c, nv))
    col4row = np.asarray(f(jnp.asarray(cost), jnp.int32(6)))
    assert sorted(col4row.tolist()) == list(range(10))
    r, c = linear_sum_assignment(cost[:6])
    np.testing.assert_allclose(
        cost[np.arange(6), col4row[:6]].sum(), cost[:6][r, c].sum(), rtol=1e-5)


def test_lap_constant_and_tied_costs():
    """Early-training shape: near-uniform predictions give heavily tied cost
    rows (every row claims the same argmin column in the warm start). Must
    still terminate with a valid permutation at the optimal cost."""
    n = 16
    for cost in (np.zeros((n, n), np.float32),
                 np.ones((n, n), np.float32) * 3.7,
                 np.tile(np.linspace(0, 1, n, dtype=np.float32), (n, 1))):
        for valid in (None, 5, n):
            col4row = np.asarray(lap_square(jnp.asarray(cost), valid))
            assert sorted(col4row.tolist()) == list(range(n))
            nv = n if valid is None else valid
            if nv:
                r, c = linear_sum_assignment(cost[:nv])
                np.testing.assert_allclose(
                    cost[np.arange(nv), col4row[:nv]].sum(),
                    cost[:nv][r, c].sum(), rtol=1e-5)


def test_lap_jit_and_grad_safe():
    cost = jnp.asarray(np.random.default_rng(0).uniform(size=(8, 8)), jnp.float32)
    out = jax.jit(lap_square)(cost)
    assert out.shape == (8,)
