"""LPIPS (VGG16 backbone) in JAX.

The reference uses the `lpips` pip package with pretrained VGG weights
(tester.py:43,91). This environment has no network egress and no torchvision /
lpips package, so pretrained weights cannot be downloaded. Policy:

- the full LPIPS-VGG architecture is implemented here (conv stack, per-layer
  unit-normalize, learned 1x1 linear heads, spatial average);
- weights load from an .npz file (``--lpips_weights``) with keys
  ``conv{i}_w/conv{i}_b`` (VGG16 features) and ``lin{k}_w`` (LPIPS heads),
  convertible from the public lpips checkpoint with tools/convert_lpips.py;
  the converter + this forward are validated against a torch re-derivation of
  the LPIPS algorithm with identical weights (tests/test_lpips.py) — the
  pretrained VALUES themselves cannot be validated here (no egress);
- without weights, load_lpips returns None and the LPIPS column is NaN
  (documented deviation — PSNR/SSIM/AP are unaffected).

Normalization parity (ADVICE r1): the reference calls lpips WITHOUT
``normalize=True`` on [0,1] images (tester.py:43,91), i.e. the net consumes
the [0,1] range as-is even though lpips' documented input domain is [-1,1].
``normalize=False`` (default) reproduces that exactly so our LPIPS column is
comparable to reference logs; ``normalize=True`` gives the correct-usage
remap.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: (out_channels, pool_before) per conv layer; LPIPS taps
# the outputs of conv2_2(idx 3), conv3_3(6), conv4_3(9), conv5_3(12), relu1_2(1)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_TAPS = (1, 3, 6, 9, 12)  # conv indices (0-based among convs) after which LPIPS taps

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_features(params, x):
    """x: [N, H, W, 3] scaled to [-1, 1]. Returns tapped feature maps."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    ci = 0
    for item in _VGG_CFG:
        if item == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        w = params[f"conv{ci}_w"]  # [kh, kw, cin, cout]
        b = params[f"conv{ci}_b"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        if ci in _TAPS:
            feats.append(h)
        ci += 1
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance(params, img0, img1, normalize: bool = False) -> jnp.ndarray:
    """img0/img1: [H, W, 3] in [0, 1]. Returns scalar LPIPS distance.

    normalize=False (default) feeds the [0,1] images straight to the scaling
    layer — the reference's effective behavior (see module docstring);
    normalize=True remaps to the documented [-1,1] input domain first."""
    if normalize:
        img0 = img0 * 2.0 - 1.0
        img1 = img1 * 2.0 - 1.0
    x0 = jnp.asarray(img0, jnp.float32)[None]
    x1 = jnp.asarray(img1, jnp.float32)[None]
    f0 = _vgg_features(params, x0)
    f1 = _vgg_features(params, x1)
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        d = (_normalize(a) - _normalize(b)) ** 2
        lin = params[f"lin{k}_w"]  # [C] nonneg weights of the 1x1 conv
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def load_lpips(weights_path: Optional[str],
               normalize: bool = False) -> Optional[Callable]:
    """Returns lpips(img, gt) -> float, or None if weights are unavailable."""
    if not weights_path or not os.path.exists(weights_path):
        return None
    data = np.load(weights_path)
    params = {k: jnp.asarray(data[k]) for k in data.files}
    fn = jax.jit(lambda a, b: lpips_distance(params, a, b, normalize=normalize))

    def metric(img, gt):
        return float(fn(jnp.asarray(img, jnp.float32), jnp.asarray(gt, jnp.float32)))

    return metric
