"""Sinusoidal positional encoding.

Behavior parity with the reference Embedder (/root/reference/networks/dm_nerf.py:8-55):
identity + [sin(x*2^i), cos(x*2^i)] for i in 0..multires-1 (log-spaced), channel
layout [x, sin(f0*x), cos(f0*x), sin(f1*x), ...] with 3 channels per block.

TPU note: computed on the VPU; inside the fused Pallas field kernel the encoding is
generated in VMEM so the encoded features never round-trip through HBM.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def encoding_dim(multires: int, input_dims: int = 3, include_input: bool = True) -> int:
    if multires <= 0:  # identity embedding (i_embed == -1)
        return input_dims
    return input_dims * (int(include_input) + 2 * multires)


def freq_bands(multires: int) -> np.ndarray:
    """2^linspace(0, multires-1, multires) — log-sampled frequency bands."""
    return 2.0 ** np.linspace(0.0, multires - 1, multires)


def positional_encoding(x: jnp.ndarray, multires: int, include_input: bool = True) -> jnp.ndarray:
    """x: [..., D] -> [..., D*(1+2*multires)].

    Channel order matches the reference embedder: per frequency, sin block then
    cos block (each D channels), frequencies ascending.
    """
    if multires <= 0:
        return x
    bands = jnp.asarray(freq_bands(multires), dtype=x.dtype)  # [F]
    # [..., F, D]
    xb = x[..., None, :] * bands[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per-frequency sin/cos blocks: [..., F, 2, D] -> [..., F*2*D]
    sc = jnp.stack([sin, cos], axis=-2)
    enc = sc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
