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


# Trace-time override of sample_pdf's `form` argument (None = use the call's
# value). bench.py's render-form A/B sets this around renderer CONSTRUCTION:
# the chosen form is baked into the trace, so already-compiled callables are
# unaffected. Not a runtime knob — production callers all ride form='auto'.
FORM_OVERRIDE: str | None = None


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key: jax.Array | None = None, det: bool = False,
               form: str = "auto") -> jnp.ndarray:
    """Inverse-CDF sampling of n_samples from a piecewise-constant pdf.

    bins:    [..., B] bin positions (z midpoints)
    weights: [..., B-1] unnormalized pdf per interval
    (so cdf and bins have equal length B, as in the reference)
    Returns [..., n_samples]. Gradients are NOT stopped here; the caller applies
    stop_gradient (the reference detaches the result, render.py:68).

    form: 'mask' (8-pass masked reductions, pure VPU), 'matmul' (boundary-
    onehot batched matmul on the MXU), or 'auto' (pick by leading batch size —
    see the measurement table below). Both forms produce bitwise-identical f32
    PRIMAL outputs (tests/test_core.py::test_sample_pdf_forms_bitwise_equal);
    gradients are NOT form-equal at duplicate cdf values (max/min split the
    cotangent among ties, the onehot routes it to one index), so a caller that
    differentiates through this function would see form-dependent — hence,
    via 'auto', batch-size-dependent — gradients. All current callers
    stop_gradient the result (reference render.py:68); keep doing that.
    """
    if FORM_OVERRIDE is not None:
        form = FORM_OVERRIDE
    if form not in ("auto", "matmul", "mask"):
        raise ValueError(f"sample_pdf: unknown form {form!r} "
                         "(expected 'auto', 'matmul' or 'mask')")
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

    # searchsorted(cdf, u, right=True) == count of cdf entries <= u; both
    # forms below realize the four gathers cdf/bins[below/above] from the same
    # [.., S, B] comparison without any dynamic-index gather. History:
    # take_along_axis gathers measured 33 ms at the reference workload on TPU.
    # Form choice (measured IN CONTEXT on v5e, B=65, S=128, f32 — standalone
    # micro-timings are dispatch-dominated on this tunnel and do not resolve
    # the forms): the matmul form wins the edit path's chunk-128 batched det
    # calls (~3.5x fewer VPU passes; round-4 edit A/B); the mask form wins
    # the train step (batch 3072) AND the fused eval render (chunk 512 —
    # round-5 interleaved whole-render A/B: mask 280.1k vs matmul 275.6k
    # rays/s), where the [.., S, B] x [.., B, 4] contraction's 4-wide output
    # pads to 128 MXU lanes. 'auto' switches on the flattened leading batch
    # size; the two measured points are 128 (matmul) and 512 (mask), so the
    # threshold sits at 128 — the largest batch where matmul has ever won.
    if form == "auto":
        batch = 1
        for d in cdf.shape[:-1]:
            batch *= d
        form = "matmul" if batch <= 128 else "mask"

    if form == "matmul":
        # Boundary-onehot batched matmul: le[s,b] = (cdf[b] <= u_s) is
        # monotone non-increasing in b (cdf sorted), so le[s,b] - le[s,b+1]
        # is the 0/1 indicator of b == below[s] (= max b with cdf[b] <= u_s;
        # cdf[0] = 0 <= u guarantees it exists), and onehot @ [cdf, bins,
        # cdf>>1, bins>>1] gathers all four in a single MXU contraction.
        # >>1 is the clamped shift vals[min(b+1, B-1)], which at b = below IS
        # vals[above]. Exactness: the onehot entries are exact 0/1 and the
        # contraction runs at HIGHEST precision, so each output is the
        # bitwise f32 gather (one nonzero product per row).
        le = (cdf[..., None, :] <= u[..., :, None]).astype(cdf.dtype)
        onehot = le - jnp.concatenate(
            [le[..., 1:], jnp.zeros_like(le[..., :1])], axis=-1)
        shift = lambda v: jnp.concatenate([v[..., 1:], v[..., -1:]], axis=-1)
        vals = jnp.stack([cdf, bins, shift(cdf), shift(bins)], axis=-1)
        picked = jax.lax.dot_general(
            onehot, vals,
            dimension_numbers=(((onehot.ndim - 1,), (vals.ndim - 2,)),
                               (tuple(range(onehot.ndim - 2)),
                                tuple(range(vals.ndim - 2)))),
            precision=jax.lax.Precision.HIGHEST)                    # [.., S, 4]
        cdf_below, bins_below = picked[..., 0], picked[..., 1]
        cdf_above, bins_above = picked[..., 2], picked[..., 3]
    else:
        # Masked reductions: cdf and bins are sorted, so vals[below] is the
        # max over the prefix where cdf <= u and vals[above] the min over the
        # suffix — 8 pure-VPU passes over [.., S, B], no MXU involvement.
        # Sentinels derive from the dtype (finite under bf16 too, where a
        # 1e30 literal would round to inf and break the == detection).
        le = cdf[..., None, :] <= u[..., :, None]        # [..., S, B]
        neg = -jnp.finfo(cdf.dtype).max
        pos = jnp.finfo(cdf.dtype).max

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
