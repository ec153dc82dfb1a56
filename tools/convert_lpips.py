"""Convert LPIPS-VGG weights (the `lpips` pip package checkpoint + torchvision
VGG16 features) into the .npz layout eval/lpips_jax.py loads.

Usage (on a machine that has the weights; this environment has no egress):
    python tools/convert_lpips.py --vgg vgg16_features.pth --lin lpips_vgg.pth \
        --out lpips_vgg_jax.npz

Expected inputs:
- --vgg: state_dict of torchvision vgg16(...).features
         (keys '0.weight', '0.bias', '2.weight', ... for conv layers)
- --lin: state_dict of lpips.LPIPS(net='vgg') lin layers
         (keys 'lin0.model.1.weight' ... 'lin4.model.1.weight')

Output keys: conv{i}_w [kh,kw,cin,cout], conv{i}_b [cout] for the 13 convs
(in order, pool layers skipped), lin{k}_w [C] (nonnegative 1x1 weights).
"""

import argparse

import numpy as np

# torchvision vgg16.features conv layer indices (pools at 4, 9, 16, 23, 30)
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True)
    ap.add_argument("--lin", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    vgg = torch.load(args.vgg, map_location="cpu")
    lin = torch.load(args.lin, map_location="cpu")

    out = {}
    for ci, ti in enumerate(VGG16_CONV_IDX):
        w = vgg[f"{ti}.weight"].numpy()  # [cout, cin, kh, kw]
        b = vgg[f"{ti}.bias"].numpy()
        out[f"conv{ci}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{ci}_b"] = b
    for k in range(5):
        w = lin[f"lin{k}.model.1.weight"].numpy()  # [1, C, 1, 1]
        out[f"lin{k}_w"] = np.maximum(w.reshape(-1), 0.0)

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
