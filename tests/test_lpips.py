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


def _fake_lpips_full_state_dict():
    """Fabricate a full lpips.LPIPS(net='vgg') state_dict: VGG16 convs under
    net.slice{s}.{orig_features_idx}.*, lin heads under lin{k}.model.1.weight."""
    import torch

    from tools.convert_lpips import LIN_CHANNELS, VGG16_CONV_IDX, VGG16_CONV_SHAPES

    rng = np.random.default_rng(7)
    sd = {}
    for ti, shape in zip(VGG16_CONV_IDX, VGG16_CONV_SHAPES):
        s = 1 + (ti >= 4) + (ti >= 9) + (ti >= 16) + (ti >= 23)
        sd[f"net.slice{s}.{ti}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, shape).astype(np.float32))
        sd[f"net.slice{s}.{ti}.bias"] = torch.zeros(shape[0])
    for k, c in enumerate(LIN_CHANNELS):
        sd[f"lin{k}.model.1.weight"] = torch.from_numpy(
            rng.uniform(-0.2, 1.0, (1, c, 1, 1)).astype(np.float32))
    return sd


def test_converter_roundtrip_unnans_lpips_column(tmp_path):
    """Full contract drill: raw state_dict file -> convert_files -> npz ->
    render_test reports a finite LPIPS column (verdict r2 item 7)."""
    torch = pytest.importorskip("torch")

    from dmnerf_tpu.eval.tester import render_test
    from tools.convert_lpips import convert_files

    sd_path = os.path.join(tmp_path, "lpips_full.pth")
    torch.save(_fake_lpips_full_state_dict(), sd_path)
    out = convert_files(lpips_path=sd_path)
    npz_path = os.path.join(tmp_path, "w.npz")
    np.savez(npz_path, **out)

    fn = load_lpips(npz_path)
    assert fn is not None

    rng = np.random.default_rng(3)
    H = W = 16
    gt = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    gt_label = np.zeros((1, H, W), np.int64)

    def render_im(params, K, c2w):
        rgb = np.clip(gt[0] + rng.normal(0, 0.05, gt[0].shape), 0, 1)
        return (rgb.astype(np.float32), np.zeros((H, W), np.int64),
                np.ones((H, W), np.float32), np.zeros((H, W), np.float32))

    import types
    args = types.SimpleNamespace(ins_num=4, lpips_weights=npz_path,
                                 crop_height=0, crop_width=0, N_test=256)
    res = render_test(render_im, None, np.eye(4)[None], (H, W, np.eye(3)),
                      args, gt_imgs=gt, gt_labels=gt_label,
                      savedir=str(tmp_path))
    assert res is not None and np.isfinite(res[2]) and res[2] > 0
    table = np.loadtxt(os.path.join(tmp_path, "test_results.txt"))
    assert np.isfinite(table[:, 2]).all()


def test_converter_two_file_form_and_validation(tmp_path):
    torch = pytest.importorskip("torch")

    from tools.convert_lpips import (VGG16_CONV_IDX, VGG16_CONV_SHAPES,
                                     convert_files, convert_state_dicts)

    rng = np.random.default_rng(9)
    vgg_sd = {}
    for ti, shape in zip(VGG16_CONV_IDX, VGG16_CONV_SHAPES):
        vgg_sd[f"{ti}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, shape).astype(np.float32))
        vgg_sd[f"{ti}.bias"] = torch.zeros(shape[0])
    lin_sd = {f"lin{k}.model.1.weight":
              torch.from_numpy(rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32))
              for k, c in enumerate([64, 128, 256, 512, 512])}
    vp, lp = os.path.join(tmp_path, "vgg.pth"), os.path.join(tmp_path, "lin.pth")
    torch.save(vgg_sd, vp)
    torch.save(lin_sd, lp)
    out = convert_files(vgg_path=vp, lin_path=lp)
    assert out["conv0_w"].shape == (3, 3, 3, 64)
    assert out["lin4_w"].shape == (512,)
    assert (out["lin0_w"] >= 0).all()

    # wrong conv shape must be rejected with a clear error
    bad = dict(vgg_sd)
    bad["0.weight"] = torch.zeros(64, 3, 5, 5)
    with pytest.raises(ValueError, match="conv0"):
        convert_state_dicts(bad, lin_sd)
    # missing lin key must be rejected
    with pytest.raises(KeyError, match="lin4"):
        convert_state_dicts(vgg_sd, {k: v for k, v in lin_sd.items()
                                     if "lin4" not in k})
