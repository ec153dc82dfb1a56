"""Depth sampling along rays: coarse linear bins, stratified perturbation, and
inverse-CDF importance sampling.

Parity:
- z_val_sample: linear in depth (not disparity), /root/reference/networks/helpers.py:114-119
- perturb: stratified jitter within mid-point bins, /root/reference/networks/render.py:40-47
- sample_pdf: inverse-CDF with searchsorted(right) semantics,
  /root/reference/networks/helpers.py:123-155

TPU design: searchsorted is expressed as a vectorized comparison-count
(sum over bins of cdf <= u) which lowers to pure VPU ops with static shapes —
no data-dependent control flow, no gather along a dynamic axis other than a
single take_along_axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def z_val_sample(n_rays: int, near: float, far: float, n_samples: int) -> jnp.ndarray:
    """[n_rays, n_samples] linear-in-depth bins in [near, far]."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = near + t * (far - near)
    return jnp.broadcast_to(z, (n_rays, n_samples))


def perturb_z_vals(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified samples within bins defined by midpoints."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key: jax.Array | None = None, det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling of n_samples from a piecewise-constant pdf.

    bins:    [..., B] bin positions (z midpoints)
    weights: [..., B-1] unnormalized pdf per interval
    (so cdf and bins have equal length B, as in the reference)
    Returns [..., n_samples]. Gradients are NOT stopped here; the caller applies
    stop_gradient (the reference detaches the result, render.py:68).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., B]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        assert key is not None, "sample_pdf needs a key unless det=True"
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    # searchsorted(cdf, u, right=True) == count of cdf entries <= u. The four
    # gathers cdf/bins[below/above] are ONE boundary-onehot batched matmul:
    # le[s,b] = (cdf[b] <= u_s) is monotone non-increasing in b (cdf sorted),
    # so le[s,b] - le[s,b+1] is the 0/1 indicator of b == below[s]
    # (= max b with cdf[b] <= u_s; cdf[0] = 0 <= u guarantees it exists), and
    # onehot @ [cdf, bins, cdf>>1, bins>>1] gathers all four in a single MXU
    # contraction. >>1 is the clamped shift vals[min(b+1, B-1)], which at
    # b = below IS vals[above]. Exactness: the onehot entries are exact 0/1
    # and the contraction runs at HIGHEST precision, so each output is the
    # bitwise f32 gather (one nonzero product per row). History: take_along_
    # axis gathers measured 33 ms at the reference workload on TPU; the
    # 8-pass masked-reduction form ~2 ms; this single-pass form ~0.5 ms (and
    # ~3.5x fewer VPU passes on the eval/edit paths' det calls).
    le = (cdf[..., None, :] <= u[..., :, None]).astype(cdf.dtype)  # [.., S, B]
    onehot = le - jnp.concatenate(
        [le[..., 1:], jnp.zeros_like(le[..., :1])], axis=-1)
    shift = lambda v: jnp.concatenate([v[..., 1:], v[..., -1:]], axis=-1)
    vals = jnp.stack([cdf, bins, shift(cdf), shift(bins)], axis=-1)  # [.., B, 4]
    picked = jax.lax.dot_general(
        onehot, vals,
        dimension_numbers=(((onehot.ndim - 1,), (vals.ndim - 2,)),
                           (tuple(range(onehot.ndim - 2)),
                            tuple(range(vals.ndim - 2)))),
        precision=jax.lax.Precision.HIGHEST)                        # [.., S, 4]
    cdf_below, bins_below = picked[..., 0], picked[..., 1]
    cdf_above, bins_above = picked[..., 2], picked[..., 3]

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
