"""In-graph linear assignment (Hungarian / Jonker-Volgenant) for small square
cost matrices.

Why: the reference calls scipy.optimize.linear_sum_assignment on the CPU **every
training step** (/root/reference/networks/evaluator.py:43-52), forcing a
device→host sync in the hot loop. Here the LAP runs inside jit with fixed shapes
(cost is [K, K] with K = ins_num, typically ≤ 64), so the TPU pipeline never
stalls. Rectangular problems (valid_rows ≤ K) are handled by padding the invalid
rows with a constant — constant rows cost the same under any assignment, so the
optimum restricted to real rows equals the rectangular optimum.

Algorithm: shortest-augmenting-path with potentials (the same family scipy uses),
one Dijkstra phase per row; all loops are lax.while_loop/fori_loop with masks so
everything is static-shape and compiles once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def lap_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost perfect assignment on an [n, n] cost matrix.

    Returns col4row: int32 [n], the column assigned to each row.
    Deterministic (ties broken by lowest column index). Differentiable? No —
    callers should pass stop_gradient'd costs; the output is integer indices.
    """
    n = cost.shape[0]
    assert cost.shape == (n, n)
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    # NaN/Inf costs would make the Dijkstra argmin scan garbage and the
    # while_loops spin forever — on TPU that trips the device watchdog and
    # kills the worker. Sanitize, and bound every loop below by n iterations.
    cost = jnp.nan_to_num(cost, nan=0.0, posinf=_INF / 2, neginf=-_INF / 2)

    def solve_row(carry, cur_row):
        u, v, col4row, row4col = carry

        # --- Dijkstra phase: find shortest augmenting path from cur_row ---
        dist0 = jnp.full((n,), _INF)
        path0 = jnp.full((n,), -1, dtype=jnp.int32)
        scanned_cols0 = jnp.zeros((n,), dtype=bool)
        scanned_rows0 = jnp.zeros((n,), dtype=bool)

        def dij_cond(st):
            _, _, _, _, sink, _, _, it = st
            return (sink < 0) & (it <= n)

        def dij_body(st):
            dist, path, sc, sr, sink, i, minval, it = st
            sr = sr.at[i].set(True)
            # relax all unscanned columns from row i
            red = minval + cost[i] - u[i] - v
            better = (red < dist) & (~sc)
            dist = jnp.where(better, red, dist)
            path = jnp.where(better, i, path)
            # pick unscanned column with min dist
            masked = jnp.where(sc, _INF, dist)
            j = jnp.argmin(masked).astype(jnp.int32)
            minval = masked[j]
            sc = sc.at[j].set(True)
            # if j is unassigned we are done; else continue from its row
            rj = row4col[j]
            sink = jnp.where(rj < 0, j, sink)
            i = jnp.where(rj < 0, i, rj)
            return (dist, path, sc, sr, sink, i, minval, it + 1)

        dist, path, sc, sr, sink, _, minval, _ = jax.lax.while_loop(
            dij_cond, dij_body,
            (dist0, path0, scanned_cols0, scanned_rows0,
             jnp.int32(-1), cur_row.astype(jnp.int32), jnp.float32(0.0),
             jnp.int32(0)))
        # fallback sink if the bounded loop exited without one (degenerate
        # input): first unassigned column
        unassigned = row4col < 0
        fallback = jnp.argmax(unassigned).astype(jnp.int32)
        sink = jnp.where(sink < 0, fallback, sink)

        # --- update potentials ---
        u = u.at[cur_row].add(minval)
        # scanned rows other than cur_row: u[i] += minval - dist[col4row[i]]
        row_idx = jnp.arange(n)
        others = sr & (row_idx != cur_row)
        d_at_assigned = dist[jnp.clip(col4row, 0, n - 1)]
        u = jnp.where(others, u + minval - d_at_assigned, u)
        v = jnp.where(sc, v - (minval - dist), v)

        # --- augment along the alternating path ---
        def aug_cond(st):
            _, _, _, done, it = st
            return (~done) & (it <= n)

        def aug_body(st):
            j, c4r, r4c, _, it = st
            i = jnp.where(path[j] < 0, cur_row.astype(jnp.int32), path[j])
            r4c = r4c.at[j].set(i)
            prev_j = c4r[i]
            c4r = c4r.at[i].set(j)
            done = i == cur_row
            return (prev_j, c4r, r4c, done, it + 1)

        _, col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (sink, col4row, row4col, jnp.bool_(False), jnp.int32(0)))

        return (u, v, col4row, row4col), None

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    c0 = jnp.full((n,), -1, jnp.int32)
    r0 = jnp.full((n,), -1, jnp.int32)
    (u, v, col4row, row4col), _ = jax.lax.scan(
        solve_row, (u0, v0, c0, r0), jnp.arange(n))
    return col4row
