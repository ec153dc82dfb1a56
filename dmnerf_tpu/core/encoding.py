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


def positional_encoding_grouped(x: jnp.ndarray, multires: int,
                                include_input: bool = True) -> jnp.ndarray:
    """Same VALUES as positional_encoding, different channel ORDER:
    [x, sin(f0)x, sin(f1)x, ..., cos(f0)x, cos(f1)x, ...] (sin block then cos
    block, frequency-major), computed as sin/cos of ONE [.., D] @ [D, D*F]
    matmul. The reference-interleaved layout needs a rank-5 stack + reshape
    whose XLA lowering cost ~4 ms/step of pad/copy/layout traffic feeding the
    Pallas kernels (profiled, round 3); this form stays rank-2/3 end to end.
    Consumers that load reference-ordered first-layer weights must permute
    their rows with pe_group_permutation (values are bit-identical: the
    band multiplications are exact powers of two either way)."""
    if multires <= 0:
        return x
    D = x.shape[-1]
    bands = freq_bands(multires)
    B = np.zeros((D, D * multires), np.float32)
    for f in range(multires):
        for d in range(D):
            B[d, f * D + d] = bands[f]
    xb = x @ jnp.asarray(B, x.dtype)
    parts = ([x] if include_input else []) + [jnp.sin(xb), jnp.cos(xb)]
    return jnp.concatenate(parts, axis=-1)


def pe_group_permutation(multires: int, input_dims: int = 3,
                         include_input: bool = True) -> np.ndarray:
    """Index map `perm` with grouped[..., k] == reference[..., perm[k]].
    Permuting reference-ordered first-layer weight ROWS by `perm` makes them
    consume positional_encoding_grouped outputs with identical results."""
    if multires <= 0:
        return np.arange(input_dims)
    base = input_dims if include_input else 0
    perm = list(range(base))
    for trig in range(2):  # sin block, then cos block
        for f in range(multires):
            for d in range(input_dims):
                perm.append(base + f * 2 * input_dims + trig * input_dims + d)
    return np.asarray(perm, np.int64)


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
