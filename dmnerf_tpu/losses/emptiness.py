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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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

    mask_before = (p_dists < dists_before).astype(jnp.float32)
    mask_after = (p_dists > dists_after).astype(jnp.float32)
    mask_middle = 1.0 - (mask_after + mask_before)

    logits = raw[..., 4:]  # [R, S, K+1]
    n_ch = logits.shape[-1]

    # BCE in logit space: -log(sigmoid(x)) = softplus(-x),
    # -log(1-sigmoid(x)) = softplus(x). The reference computes
    # log(sigmoid(x) + 1e-8) (penalizer.py:33-48) whose jitted gradient can
    # fuse into inf*0 = NaN when sigmoid saturates to exactly 1.0 in fp32;
    # softplus is exact and stable (values differ only where the reference's
    # epsilon clamps the true BCE at ~18.4).
    # before-depth: push all channels toward one-hot(air):
    # air channel -> softplus(-x); others -> softplus(x)
    # one softplus per element: softplus(-x) for the air channel, softplus(x)
    # for the rest, selected by folding the sign in (identical values; the
    # two-softplus-and-mask form costs 2x the transcendental work)
    sign = jnp.ones((n_ch,), jnp.float32).at[-1].set(-1.0)
    bce_before = jax.nn.softplus(sign * logits)
    w_before = gauss_air * mask_before
    loss_before = jnp.sum(bce_before * w_before[..., None]) / (
        n_ch * jnp.maximum(jnp.sum(mask_before), 1e-8))

    # middle band: push the air channel toward 0: -log(1-p_air) = softplus(x)
    bce_middle = jax.nn.softplus(logits[..., -1])
    w_middle = gauss * mask_middle
    loss_middle = jnp.sum(bce_middle * w_middle) / jnp.maximum(jnp.sum(mask_middle), 1e-8)

    return loss_before + loss_middle


def ins_penalizer(raw: jnp.ndarray, z_vals: jnp.ndarray, depth: jnp.ndarray,
                  rays_d: jnp.ndarray, tolerance: float, deta_w: float) -> jnp.ndarray:
    depth = jax.lax.stop_gradient(depth[..., None])
    return emptiness_penalizer(raw, z_vals, depth, rays_d, tolerance, deta_w)
