"""End-to-end LPIPS validation against a torch oracle.

Builds random weights in the EXACT layouts the public checkpoints use
(torchvision `vgg16().features` state_dict + `lpips.LPIPS(net='vgg')` lin
state_dict), runs tools/convert_lpips.py on them, and checks the JAX forward
(eval/lpips_jax.py) against an independent torch re-derivation of the LPIPS
algorithm (Zhang et al. 2018: tapped VGG relus, per-layer channel-unit-
normalize, squared diff, learned nonneg 1x1 weights, spatial average, sum).

This validates everything except the pretrained VALUES (no egress here): the
converter's key mapping and OIHW->HWIO transposes, the conv/pool/tap
structure, the scaling layer, and the normalize semantics. With the real
checkpoints, the same converter produces real LPIPS numbers.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.oracle

from dmnerf_tpu.eval.lpips_jax import load_lpips
from tools.convert_lpips import VGG16_CONV_IDX

_POOLS = {4, 9, 16, 23, 30}
_TAP_CONVS = {1, 3, 6, 9, 12}  # 0-based conv counter: relu1_2/2_2/3_3/4_3/5_3
_CHANS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]


def _make_torch_state_dicts(rng):
    vgg = {}
    cin = 3
    for ci, ti in enumerate(VGG16_CONV_IDX):
        cout = _CHANS[ci]
        vgg[f"{ti}.weight"] = torch.tensor(
            rng.normal(0, 0.08, (cout, cin, 3, 3)).astype(np.float32))
        vgg[f"{ti}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (cout,)).astype(np.float32))
        cin = cout
    lin = {}
    for k, ci in enumerate(sorted(_TAP_CONVS)):
        c = _CHANS[ci]
        lin[f"lin{k}.model.1.weight"] = torch.tensor(
            rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32))
    return vgg, lin


def _torch_lpips(vgg_sd, lin_sd, img0, img1):
    """Independent torch implementation of the LPIPS-VGG forward."""
    import torch.nn.functional as F

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.tensor(img).permute(2, 0, 1)[None]  # NCHW; [0,1] fed as-is
        h = (x - shift) / scale
        taps = []
        ci = 0
        for ti in range(31):
            if ti in set(VGG16_CONV_IDX):
                h = F.conv2d(h, vgg_sd[f"{ti}.weight"], vgg_sd[f"{ti}.bias"],
                             padding=1)
                h = F.relu(h)
                if ci in _TAP_CONVS:
                    taps.append(h)
                ci += 1
            elif ti in _POOLS:
                h = F.max_pool2d(h, 2, 2)
        return taps

    f0, f1 = feats(img0), feats(img1)
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb).pow(2)
        w = lin_sd[f"lin{k}.model.1.weight"].clamp(min=0)
        total = total + F.conv2d(d, w).mean()
    return float(total)


def test_lpips_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(42)
    vgg_sd, lin_sd = _make_torch_state_dicts(rng)
    vgg_p, lin_p = str(tmp_path / "vgg.pth"), str(tmp_path / "lin.pth")
    out_p = str(tmp_path / "lpips_jax.npz")
    torch.save(vgg_sd, vgg_p)
    torch.save(lin_sd, lin_p)

    # run the real converter
    from tools import convert_lpips
    argv = sys.argv
    sys.argv = ["convert_lpips", "--vgg", vgg_p, "--lin", lin_p, "--out", out_p]
    try:
        convert_lpips.main()
    finally:
        sys.argv = argv

    fn = load_lpips(out_p)  # normalize=False = reference behavior
    img0 = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.2, img0.shape), 0, 1).astype(np.float32)

    for a, b in [(img0, img1), (img0, img0), (img1, np.zeros_like(img1))]:
        want = _torch_lpips(vgg_sd, lin_sd, a, b)
        got = fn(a, b)
        assert got == pytest.approx(want, abs=1e-4), (got, want)


def test_lpips_golden_values(tmp_path):
    """Frozen fixed-seed (weights, image pair) -> distance values: guards the
    whole LPIPS pipeline against silent refactor drift."""
    rng = np.random.default_rng(42)
    vgg_sd, lin_sd = _make_torch_state_dicts(rng)
    vgg_p, lin_p = str(tmp_path / "vgg.pth"), str(tmp_path / "lin.pth")
    out_p = str(tmp_path / "w.npz")
    torch.save(vgg_sd, vgg_p)
    torch.save(lin_sd, lin_p)
    from tools import convert_lpips
    argv = sys.argv
    sys.argv = ["convert_lpips", "--vgg", vgg_p, "--lin", lin_p, "--out", out_p]
    try:
        convert_lpips.main()
    finally:
        sys.argv = argv

    fn = load_lpips(out_p)
    r2 = np.random.default_rng(7)
    img0 = r2.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    img1 = np.clip(img0 + 0.25 * np.sin(np.arange(32 * 32 * 3)
                                        ).reshape(32, 32, 3), 0, 1).astype(np.float32)
    got = fn(img0, img1)
    # value pinned from the torch oracle at authoring time (2026-08-16)
    assert got == pytest.approx(0.004563, abs=2e-5)
