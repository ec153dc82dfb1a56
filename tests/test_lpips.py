"""LPIPS-VGG architecture: loads .npz weights, identity distance == 0,
perturbation increases distance (random weights — structure test; real
pretrained weights come from tools/convert_lpips.py)."""

import os

import numpy as np
import pytest

from dmnerf_tpu.eval.lpips_jax import _TAPS, _VGG_CFG, load_lpips


def _random_weights(path):
    rng = np.random.default_rng(0)
    out = {}
    cin = 3
    ci = 0
    taps = []
    for item in _VGG_CFG:
        if item == "M":
            continue
        cout = item
        out[f"conv{ci}_w"] = rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
        out[f"conv{ci}_b"] = np.zeros(cout, np.float32)
        if ci in _TAPS:
            taps.append(cout)
        cin = cout
        ci += 1
    for k, c in enumerate(taps):
        out[f"lin{k}_w"] = rng.uniform(0, 1, c).astype(np.float32)
    np.savez(path, **out)


def test_lpips_gated_without_weights():
    assert load_lpips(None) is None
    assert load_lpips("/nonexistent/weights.npz") is None


def test_lpips_structure(tmp_path):
    p = os.path.join(tmp_path, "w.npz")
    _random_weights(p)
    fn = load_lpips(p)
    assert fn is not None
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert fn(img, img) == pytest.approx(0.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
    d = fn(img, noisy)
    assert np.isfinite(d) and d > 0
    noisier = np.clip(img + rng.normal(0, 0.7, img.shape), 0, 1).astype(np.float32)
    assert fn(img, noisier) > d
