#!/usr/bin/env python
"""Visualize the camera/light layout of a multi-light annotation.

Counterpart of the reference ``projects/NeuralLumen/scripts/visualize_rene.py``:
scatter the camera grid and the light grid, each projected into the frame of
its first member, with index labels — the plot used to choose ReNe
``find_idx_cam_light``-style tags. Works off any converted transforms.json
(``transform_matrix`` / ``transform_matrix_light`` per frame) instead of the
``rene`` package, and saves PNGs (headless) rather than plt.show().

Usage:
  python scripts/visualize_rene.py --anno <transforms.json> --out_dir plots/
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _unique_positions(frames, key):
    """Distinct c2w positions (order of first appearance) + the first pose."""
    seen = []
    first_pose = None
    for fr in frames:
        if key not in fr:
            continue
        m = np.asarray(fr[key], np.float32)
        if first_pose is None:
            first_pose = m
        pos = m[:3, 3]
        if not any(np.allclose(pos, p, atol=1e-6) for p in seen):
            seen.append(pos)
    return np.asarray(seen), first_pose


def plot_grid(points_2d, name, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 6))
    for i, point in enumerate(points_2d):
        plt.plot(point[0], point[1], "bo")
        plt.text(point[0], point[1], f"{i}", fontsize=15)
    plt.title("2D Points " + name)
    plt.xlabel("X axis")
    plt.ylabel("Y axis")
    plt.grid(True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print("wrote", path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--anno", required=True, help="transforms.json annotation")
    parser.add_argument("--out_dir", default=".", help="output directory for PNGs")
    args = parser.parse_args()
    with open(args.anno) as f:
        meta = json.load(f)
    frames = meta["frames"]
    os.makedirs(args.out_dir, exist_ok=True)

    for key, name in (("transform_matrix", "camera"),
                      ("transform_matrix_light", "light")):
        positions, first = _unique_positions(frames, key)
        if not len(positions):
            continue
        # Project world positions into the frame of member 0 (reference
        # visualize_rene: inv(pose_0) @ position, keep x/y).
        inv0 = np.linalg.inv(first)
        pts = (positions @ inv0[:3, :3].T + inv0[:3, 3])[:, :2]
        plot_grid(pts, name, os.path.join(args.out_dir, f"grid_{name}.png"))

    # 3D overview: camera frusta + light centers.
    from mlinerf_tpu.utils.visualize import plot_poses

    cam_poses = [np.asarray(fr["transform_matrix"], np.float32) for fr in frames]
    light_pos, _ = _unique_positions(frames, "transform_matrix_light")
    fig_path = os.path.join(args.out_dir, "poses_3d.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plot_poses(cam_poses, path=fig_path)
    if len(light_pos):
        # Re-open and add light scatter on a fresh combined plot.
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        centers = np.asarray([p[:3, 3] for p in cam_poses])
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], s=10,
                   color="tab:blue", label="cameras")
        ax.scatter(light_pos[:, 0], light_pos[:, 1], light_pos[:, 2], s=20,
                   color="tab:orange", label="lights")
        ax.legend()
        ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
        fig.savefig(fig_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    print("wrote", fig_path)


if __name__ == "__main__":
    main()
