"""LAP robustness: degenerate inputs must terminate (bounded loops) and stay
valid permutations — an unbounded device loop would trip the TPU watchdog."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from dmnerf_tpu.ops.lap import lap_square


def _check_perm(col4row, n):
    assert sorted(np.asarray(col4row).tolist()) == list(range(n))


def test_constant_matrix():
    n = 8
    out = lap_square(jnp.zeros((n, n)))
    _check_perm(out, n)


def test_tied_costs():
    n = 6
    cost = jnp.ones((n, n)).at[0, 0].set(0.0)
    out = lap_square(cost)
    _check_perm(out, n)


def test_nan_inf_sanitized():
    n = 5
    cost = jnp.full((n, n), jnp.nan).at[2, 3].set(jnp.inf).at[1, 1].set(-jnp.inf)
    out = lap_square(cost)
    _check_perm(out, n)


def test_large_dynamic_range():
    rng = np.random.default_rng(0)
    cost = (10.0 ** rng.uniform(-6, 6, (10, 10))).astype(np.float32)
    out = np.asarray(lap_square(jnp.asarray(cost)))
    _check_perm(out, 10)
    r, c = linear_sum_assignment(cost)
    ours = cost[np.arange(10), out].sum()
    np.testing.assert_allclose(ours, cost[r, c].sum(), rtol=1e-4)


def test_vmapped_matches_unbatched():
    rng = np.random.default_rng(1)
    costs = rng.uniform(0, 5, (3, 12, 12)).astype(np.float32)
    batched = np.asarray(jax.vmap(lap_square)(jnp.asarray(costs)))
    for k in range(3):
        single = np.asarray(lap_square(jnp.asarray(costs[k])))
        total_b = costs[k][np.arange(12), batched[k]].sum()
        total_s = costs[k][np.arange(12), single].sum()
        np.testing.assert_allclose(total_b, total_s, rtol=1e-5)
