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

    # searchsorted(cdf, u, right=True) == count of cdf entries <= u; then the
    # four gathers cdf/bins[below/above] are expressed as MASKED REDUCTIONS
    # over the same [.., S, B] comparison (cdf and bins are sorted, so the
    # gathered value is the max over the prefix / min over the suffix).
    # take_along_axis gathers measured 33 ms at the reference workload on TPU;
    # this form is ~2 ms.
    le = cdf[..., None, :] <= u[..., :, None]        # [..., S, B]
    neg = jnp.float32(-1e30)
    pos = jnp.float32(1e30)

    def prefix_max(vals):   # vals[below] with below clamped to 0
        m = jnp.max(jnp.where(le, vals[..., None, :], neg), axis=-1)
        return jnp.where(m == neg, vals[..., :1], m)

    def suffix_min(vals):   # vals[above] with above clamped to B-1
        m = jnp.min(jnp.where(le, pos, vals[..., None, :]), axis=-1)
        return jnp.where(m == pos, vals[..., -1:], m)

    cdf_below = prefix_max(cdf)
    cdf_above = suffix_min(cdf)
    bins_below = prefix_max(bins)
    bins_above = suffix_min(bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
