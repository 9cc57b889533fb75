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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="assets/lpips_alex.npz")
    args = parser.parse_args()
    try:
        export_from_lpips_package(args.out)
    except ImportError:
        sys.exit("Needs the 'lpips' pip package (run this in an online env "
                 "and copy the npz here).")


if __name__ == "__main__":
    main()
