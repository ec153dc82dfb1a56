"""Emptiness penalizer vs a direct numpy oracle of penalizer.py:5-62."""

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.losses.emptiness import ins_penalizer


def oracle(raw, z_vals, depth, rays_d, tol, dw):
    deta_h = 0.4
    norm = np.linalg.norm(rays_d[:, None, :], axis=-1)  # [R,1]
    depth = depth[:, None]
    d_before = (depth - tol) * norm
    d_after = (depth + tol) * norm
    depth_dist = depth * norm
    p_dists = z_vals * norm
    delta = depth_dist - p_dists
    gauss = np.exp(-(delta ** 2) / (2 * dw ** 2)) / (deta_h * np.sqrt(2 * np.pi)) + 1e-8
    gauss_air = 1 - gauss
    m_before = (p_dists < d_before).astype(np.float32)
    m_after = (p_dists > d_after).astype(np.float32)
    m_middle = 1 - (m_after + m_before)
    pred = 1 / (1 + np.exp(-raw[..., 4:]))
    C = pred.shape[-1]
    gt = np.zeros_like(pred)
    gt[..., -1] = 1
    bce = -gt * np.log(pred + 1e-8) - (1 - gt) * np.log(1 - pred + 1e-8)
    lb = (bce * (gauss_air * m_before)[..., None]).sum() / (
        C * max(m_before.sum(), 1e-8))
    p_air = pred[..., -1]
    bm = -np.log(1 - p_air + 1e-8)
    lm = (bm * gauss * m_middle).sum() / max(m_middle.sum(), 1e-8)
    return lb + lm


def test_penalizer_matches_oracle():
    rng = np.random.default_rng(0)
    R, S, K = 16, 12, 4
    raw = rng.normal(size=(R, S, 4 + K + 1)).astype(np.float32)
    z = np.sort(rng.uniform(1, 10, (R, S)), -1).astype(np.float32)
    depth = rng.uniform(3, 8, (R,)).astype(np.float32)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    got = float(ins_penalizer(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(depth),
                              jnp.asarray(rays_d), 0.05, 0.05))
    want = oracle(raw, z, depth, rays_d, 0.05, 0.05)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_penalizer_depth_detached():
    rng = np.random.default_rng(1)
    R, S, K = 4, 6, 2
    raw = jnp.asarray(rng.normal(size=(R, S, 4 + K + 1)).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(1, 10, (R, S)), -1).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    def f(depth):
        return ins_penalizer(raw, z, depth, rays_d, 0.05, 0.05)

    g = jax.grad(f)(jnp.asarray(rng.uniform(3, 8, (R,)).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)
