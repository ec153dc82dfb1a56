"""Volume rendering: alpha compositing + the coarse→fine DM-NeRF pipeline.

Parity (/root/reference/networks/render.py):
- composite == render_train (:6-28): alpha = 1-exp(-relu(sigma)*dist*|d|),
  exclusive-cumprod transmittance, rgb/depth maps; the instance map is composited
  with **stop_gradient'd weights**, passed through sigmoid, and the last ("air")
  channel dropped (:22-26).
- render_rays == dm_nerf (:31-96): normalize viewdirs, optional stratified perturb,
  coarse field + composite, inverse-CDF importance samples on detached weights,
  sorted union of coarse+fine z, fine field + composite.

TPU design: one pure function of (params, rays, key) — jitted by callers; the
sample axis stays on-chip (N <= 192) and rays are the sharding axis. The field
evaluation is pluggable (XLA MLP or fused Pallas kernel) via `field_fn`.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dmnerf_tpu.core.sampling import perturb_z_vals, sample_pdf


class CompositeOut(NamedTuple):
    rgb: jnp.ndarray         # [R, 3]
    weights: jnp.ndarray     # [R, S]
    depth: jnp.ndarray       # [R]
    ins: jnp.ndarray         # [R, ins_num] (sigmoid, air channel dropped)
    ins_logits: jnp.ndarray  # [R, ins_num] pre-sigmoid (stable-BCE path)


def composite(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
              keep_air: bool = False) -> CompositeOut:
    """Alpha-composite raw field outputs along each ray.

    raw: [R, S, 4 + K + 1], z_vals: [R, S], rays_d: [R, 3].
    keep_air=True keeps all K+1 instance channels (manipulator path,
    manipulator.py:101-102 does not drop the air channel).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans

    # note: expressing these sums as per-ray einsum matmuls was measured SLOWER
    # (tiny [1,S]x[S,C] batched dots pay per-op overhead); the broadcast-reduce
    # fuses well in XLA
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)

    w_ins = jax.lax.stop_gradient(weights)
    ins_logits = jnp.sum(w_ins[..., None] * raw[..., 4:], axis=-2)
    ins_map = jax.nn.sigmoid(ins_logits)
    if not keep_air:
        ins_map = ins_map[..., :-1]
        ins_logits = ins_logits[..., :-1]
    return CompositeOut(rgb_map, weights, depth_map, ins_map, ins_logits)


FieldFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# field_fn(pts [R,S,3], viewdirs [R,3]) -> raw [R,S,C]


def eval_field(field_fn: FieldFn, rays_o, rays_d, viewdirs, z_vals) -> jnp.ndarray:
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return field_fn(pts, viewdirs[..., None, :])


def render_rays(coarse_fn: FieldFn, fine_fn: FieldFn,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                z_vals_coarse: jnp.ndarray, n_importance: int,
                key: Optional[jax.Array] = None,
                perturb: bool = True) -> Dict[str, jnp.ndarray]:
    """The coarse→fine render pipeline on a ray batch.

    Returns the reference's all_info dict (render.py:92-95): rgb/ins/z_vals/raw/
    depth for both passes. key=None or perturb=False gives the deterministic path
    (eval: det inverse-CDF, no jitter — test_dmsr.py:86 sets perturb False).
    """
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if perturb and key is not None:
        kz, kpdf = jax.random.split(key)
        z_vals_coarse = perturb_z_vals(kz, z_vals_coarse)
    else:
        kpdf = None

    raw_coarse = eval_field(coarse_fn, rays_o, rays_d, viewdirs, z_vals_coarse)
    rgb_c, w_c, depth_c, ins_c, ins_lg_c = composite(raw_coarse, z_vals_coarse, rays_d)

    z_mid = 0.5 * (z_vals_coarse[..., 1:] + z_vals_coarse[..., :-1])
    z_samples = sample_pdf(z_mid, w_c[..., 1:-1], n_importance,
                           key=kpdf, det=(kpdf is None))
    z_samples = jax.lax.stop_gradient(z_samples)

    z_vals_fine = jnp.sort(jnp.concatenate([z_vals_coarse, z_samples], axis=-1), axis=-1)
    raw_fine = eval_field(fine_fn, rays_o, rays_d, viewdirs, z_vals_fine)
    rgb_f, w_f, depth_f, ins_f, ins_lg_f = composite(raw_fine, z_vals_fine, rays_d)

    return {
        "rgb_fine": rgb_f, "ins_fine": ins_f, "z_vals_fine": z_vals_fine,
        "raw_fine": raw_fine, "raw_coarse": raw_coarse, "rgb_coarse": rgb_c,
        "ins_coarse": ins_c, "z_vals_coarse": z_vals_coarse,
        "depth_fine": depth_f, "depth_coarse": depth_c,
        "weights_fine": w_f,
        "ins_logits_coarse": ins_lg_c, "ins_logits_fine": ins_lg_f,
    }
