"""3D emptiness penalizer: push pre-surface samples toward the "air" channel and
near-surface samples away from it.

Parity (/root/reference/networks/penalizer.py:5-62):
- Gaussian(sigma=deta_w) weighting of |depth - sample| along the ray (metric
  distances, i.e. scaled by |rays_d|), amplitude 1/(0.4*sqrt(2pi)) + 1e-8.
- "before" region (sample < depth - tolerance): BCE of sigmoid(ins logits) toward
  one-hot(air) over ALL K+1 channels, weighted by (1 - gaussian), normalized by
  (K+1) * max(sum(mask), 1e-8).
- "middle" band (|sample - depth| <= tolerance): BCE of the air channel toward 0,
  weighted by the gaussian, normalized by max(sum(mask), 1e-8).
- depth is stop_gradient'd (penalizer.py:59).

BCE numerics: computed in logit space (softplus), which is exact and cannot
produce the inf*0 NaNs of the reference's log(sigmoid(x) + 1e-8) form at fp32
saturation; the two differ only by the 1e-8 epsilon (<= 1e-8/p per element,
oracle-tested in tests/test_reference_oracle.py).

TPU hot-path design (profiled: ~4 ms of the 38 ms train step was this loss
under plain autodiff): the BCE is a custom-VJP whose forward materializes
exactly ONE [R, S, K+1] array — t = exp(-|x|), the single transcendental pass
— fused straight into the loss reduction, and whose backward rebuilds
sigmoid(x) from the stored t (1/(1+t) or t/(1+t) by sign) in one fused
elementwise pass with ZERO transcendentals. See _bce_value for the channel-sum
identity that avoids slicing big intermediates. The weight maps depend only on
z/depth/rays_d (never on params through a live path: depth is detached, z is
input), so their cotangents are zero by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def _bce_core(raw: jnp.ndarray, wb: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
    """Sum over [R, S, C_raw] of the penalizer BCE, on the FULL-WIDTH raw.

    raw: [R, S, 4+K+1] — the rgb/density channels 0:4 are excluded by a
        compiled-in channel mask, NOT a slice. Round-3 profiling showed the
        logits-slice formulation cost ~2.6 ms/step of pure data movement:
        `raw[..., 4:]` is a lane-SHIFTED slice of a 37-lane tensor (relayout
        copy on TPU) and the backward's [R,S,33] cotangent had to be padded
        back to 37 lanes before adding to the composite's raw cotangent.
        Masked full-width ops fuse into single passes with no relayout.
    wb: [R, S] per-sample weight of the "before" BCE (already includes the
        1/(C * Z_before) normalization); targets one-hot(air).
    wm: [R, S] per-sample weight of the "middle" BCE on the AIR channel only
        (already includes 1/Z_middle); target 0.
    """
    loss, _ = _bce_value(raw, wb, wm)
    return loss


def _masks(x):
    # ins-channel and air-channel masks over the raw lane axis [C]; iota
    # comparisons fuse into the consuming pass (no materialized constants)
    C = x.shape[-1]
    c = jax.lax.iota(x.dtype, C)
    return (c >= 4).astype(x.dtype), (c == C - 1).astype(x.dtype)


def _bce_value(raw, wb, wm):
    # Materialization discipline (profiled: a first custom-VJP draft that
    # returned the gradient as the residual made XLA materialize FIVE
    # [R,S,C] f32 intermediates in the forward — 394 MB accessed, ~3 ms/step):
    # the forward materializes exactly ONE big array, t = exp(-|x|), which the
    # loss reduction consumes in the same fusion. The channel split collapses
    # via  sum_{c ins, c!=air} softplus(x_c) + softplus(-x_air)
    #        = sum_{c ins} softplus(x_c) - x_air   (softplus(-a) = softplus(a) - a)
    # and the ins/air channel selections are mask MULTIPLIES folded into the
    # same fusion:  loss = sum x_sp * (ins*wb + air*wm) - sum x*air*wb.
    x = raw
    ins, air = _masks(x)
    t = jnp.exp(-jnp.abs(x))               # the ONE transcendental pass
    sp = jnp.maximum(x, 0.0) + jnp.log1p(t)            # softplus(x)
    w_all = ins * wb[..., None] + air * wm[..., None]
    loss = jnp.sum(sp * w_all - x * (air * wb[..., None]))
    return loss, t


def _bce_fwd(raw, wb, wm):
    loss, t = _bce_value(raw, wb, wm)
    return loss, (raw, t, wb, wm)


def _bce_bwd(res, g):
    # one fused elementwise pass, zero transcendentals: sigmoid from stored t;
    # full-width [R,S,C] cotangent (zeros on rgb/density lanes via the mask),
    # added to the composite's raw cotangent with no pad/relayout
    x, t, wb, wm = res
    ins, air = _masks(x)
    inv1pt = 1.0 / (1.0 + t)
    sig = jnp.where(x >= 0, inv1pt, 1.0 - inv1pt)      # sigmoid(x)
    # per-channel target weights: every ins channel gets +wb toward
    # one-hot(air) (air: d softplus(-x)/dx = sig - 1), air additionally +wm
    w_all = ins * wb[..., None] + air * wm[..., None]
    grad = sig * w_all - air * wb[..., None]
    return (g * grad, None, None)


_bce_core.defvjp(_bce_fwd, _bce_bwd)


def emptiness_penalizer(raw: jnp.ndarray, z_vals: jnp.ndarray, depths: jnp.ndarray,
                        rays_d: jnp.ndarray, tolerance: float, deta_w: float) -> jnp.ndarray:
    """raw: [R, S, 4+K+1]; z_vals: [R, S]; depths: [R, 1] (already detached);
    rays_d: [R, 3]."""
    deta_h = 0.4
    norm = jnp.linalg.norm(rays_d[..., None, :], axis=-1)  # [R, 1]
    dists_before = (depths - tolerance) * norm
    dists_after = (depths + tolerance) * norm
    depth_dist = depths * norm
    p_dists = z_vals * norm

    delta = depth_dist - p_dists
    gauss = jnp.exp(-(delta ** 2) / (2.0 * deta_w ** 2)) / (deta_h * np.sqrt(2.0 * np.pi)) + 1e-8
    gauss_air = 1.0 - gauss

    mask_before = (p_dists < dists_before).astype(raw.dtype)
    mask_after = (p_dists > dists_after).astype(raw.dtype)
    mask_middle = 1.0 - (mask_after + mask_before)

    n_ch = raw.shape[-1] - 4  # K+1 instance channels

    # fold the reference's normalizations into the per-sample weight maps;
    # everything here depends only on z/depth/rays_d (no live param path)
    wb = gauss_air * mask_before / (n_ch * jnp.maximum(jnp.sum(mask_before), 1e-8))
    wm = gauss * mask_middle / jnp.maximum(jnp.sum(mask_middle), 1e-8)
    return _bce_core(raw, jax.lax.stop_gradient(wb),
                     jax.lax.stop_gradient(wm))


def ins_penalizer(raw: jnp.ndarray, z_vals: jnp.ndarray, depth: jnp.ndarray,
                  rays_d: jnp.ndarray, tolerance: float, deta_w: float) -> jnp.ndarray:
    depth = jax.lax.stop_gradient(depth[..., None])
    return emptiness_penalizer(raw, z_vals, depth, rays_d, tolerance, deta_w)
