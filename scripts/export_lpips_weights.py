#!/usr/bin/env python
"""Export LPIPS(AlexNet) weights to the npz layout used by
``mlinerf_tpu.pipelines.metrics.lpips``.

Run once in any environment that has the ``lpips`` package (or a torchvision
AlexNet + LPIPS linear weights file); copy the resulting
``assets/lpips_alex.npz`` next to this repo. The JAX metric then matches the
reference's ``lpips.LPIPS(net='alex', normalize=True)`` exactly.

Layout: conv{i}_w [k,k,in,out] (HWIO), conv{i}_b [1,1,1,out],
        lin{i}_w [1,1,C,1] for the five tapped ReLU features.
"""

import argparse
import os
import sys

import numpy as np


def export_from_lpips_package(out_path: str):
    import lpips as lpips_pkg
    import torch

    net = lpips_pkg.LPIPS(net="alex")
    feats = net.net  # alexnet features wrapper (slices)
    convs = []
    for module in feats.modules():
        if module.__class__.__name__ == "Conv2d":
            convs.append(module)
    assert len(convs) == 5, f"expected 5 alexnet convs, got {len(convs)}"
    out = {}
    for i, conv in enumerate(convs):
        w = conv.weight.detach().numpy()  # [out,in,k,k]
        b = conv.bias.detach().numpy()
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{i}_b"] = b.reshape(1, 1, 1, -1)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1,C,1,1]
        out[f"lin{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # [1,1,C,1]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


def export_from_state_dicts(alexnet_pth: str, lpips_pth: str, out_path: str):
    """Torch-free-of-packages converter: needs ONLY ``torch`` (to unpickle
    the two official weight files), not torchvision or lpips.

      * ``alexnet_pth``: torchvision's ImageNet AlexNet,
        https://download.pytorch.org/models/alexnet-owt-7be5be79.pth
        (keys features.{0,3,6,8,10}.{weight,bias})
      * ``lpips_pth``: the LPIPS linear heads,
        https://github.com/richzhang/PerceptualSimilarity/raw/master/
        lpips/weights/v0.1/alex.pth
        (keys lin{0..4}.model.1.weight)
    """
    import torch

    alex = torch.load(alexnet_pth, map_location="cpu", weights_only=True)
    lins = torch.load(lpips_pth, map_location="cpu", weights_only=True)
    out = {}
    conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet features indices
    for i, fid in enumerate(conv_ids):
        w = alex[f"features.{fid}.weight"].numpy()  # [out,in,k,k]
        b = alex[f"features.{fid}.bias"].numpy()
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{i}_b"] = b.reshape(1, 1, 1, -1)
    for i in range(5):
        w = lins[f"lin{i}.model.1.weight"].numpy()  # [1,C,1,1]
        out[f"lin{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # [1,1,C,1]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="assets/lpips_alex.npz")
    parser.add_argument("--alexnet-pth", help="torchvision alexnet-owt-7be5be79.pth")
    parser.add_argument("--lpips-pth", help="LPIPS v0.1 alex.pth (linear heads)")
    args = parser.parse_args()
    if args.alexnet_pth and args.lpips_pth:
        export_from_state_dicts(args.alexnet_pth, args.lpips_pth, args.out)
        return
    try:
        export_from_lpips_package(args.out)
    except ImportError:
        sys.exit(
            "Needs either the 'lpips' pip package, OR the two official weight\n"
            "files passed as --alexnet-pth/--lpips-pth (conversion then needs\n"
            "only torch):\n"
            "  https://download.pytorch.org/models/alexnet-owt-7be5be79.pth\n"
            "  https://github.com/richzhang/PerceptualSimilarity/raw/master/"
            "lpips/weights/v0.1/alex.pth")


if __name__ == "__main__":
    main()
