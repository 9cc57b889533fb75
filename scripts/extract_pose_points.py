#!/usr/bin/env python
"""Dump camera and light centers of a dataset to a PLY point cloud.

Counterpart of ``projects/NeuralLumen/scripts/extract_pose_points.py`` —
quick geometry sanity check of pose conventions in any annotation file.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--split", default="train", choices=["train", "val"])
    parser.add_argument("--output", default="poses.ply")
    args = parser.parse_args()
    from mlinerf_tpu.config import Config, resolve
    from mlinerf_tpu.ops.mesh import save_ply

    cfg = Config(args.config)
    Dataset = resolve("dataset", cfg.data.type)
    ds = Dataset(cfg, is_inference=(args.split == "val"))
    pts, colors = [], []
    for i in range(len(ds)):
        s = ds.get_full_sample(i)
        R, t = s["pose"][:3, :3], s["pose"][:3, 3]
        pts.append(-R.T @ t)
        colors.append([0, 0, 255])  # cameras blue
        if "pose_light" in s:
            Rl, tl = s["pose_light"][:3, :3], s["pose_light"][:3, 3]
            pts.append(-Rl.T @ tl)
            colors.append([255, 200, 0])  # lights yellow
    verts = np.stack(pts).astype(np.float32)
    save_ply(args.output, verts, np.zeros((0, 3), np.int64), np.asarray(colors, np.uint8))
    print(f"wrote {args.output} ({len(verts)} points)")


if __name__ == "__main__":
    main()
