"""Photometric loss + PSNR (/root/reference/networks/evaluator.py:11,15)."""

from __future__ import annotations

import jax.numpy as jnp


def img2mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
