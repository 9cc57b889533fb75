#!/usr/bin/env python
"""Convert the ReNe dataset to per-split transforms.json annotations.

Counterpart of ``projects/NeuralLumen/scripts/convert_rene_direct_to_json.py``
(:21-171): normalizes the scene by the camera+light hull radius, splits
44/3/3 cameras and 37/3 lights, and writes GL-convention
``transform_matrix``/``transform_matrix_light`` per frame. Requires the
``rene`` package to read the raw captures (the reference repo also ships the
pre-converted annotations under ``dataset_rene/`` — those work directly with
``data.type: lumen``).
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CV_TO_GL = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def cv_to_gl(c2w):
    return c2w @ CV_TO_GL


def decompose_P(P):
    """K, c2w from a 3x4 projection (RQ-style decomposition via cv2)."""
    import cv2

    K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
    K = K / K[2, 2]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    intr = np.eye(4, dtype=np.float32)
    intr[:3, :3] = K
    return intr, pose


def rene_to_json(rene, scene_name, output_path):
    n_cams, n_lights = 50, 40
    test_cams, val_cams = [4, 8, 15], [25, 42, 47]
    train_cams = [i for i in range(n_cams) if i not in test_cams + val_cams]
    test_lights = [2, 21, 34]
    train_lights = [i for i in range(n_lights) if i not in test_lights]

    # Scene radius: max distance of any camera or light center from origin.
    pts = []
    for cam_id in range(n_cams):
        pts.append(rene[scene_name][0][cam_id]["pose"]()[:3, 3])
    for light_id in range(n_lights):
        pts.append(rene[scene_name][light_id][0]["light"]()[:3, 3])
    radius = float(np.linalg.norm(np.stack(pts), axis=-1).max())
    scale_mat = np.diag([radius, radius, radius, 1.0]).astype(np.float32)
    bounding_box_aabb = np.asarray([-0.55, -0.43, -0.15, 0.55, 0.35, 0.25]) * 1.2

    pairs = {
        "all": [[i, j] for i in range(n_cams) for j in range(n_lights)],
        "train": [[i, j] for i in train_cams for j in train_lights],
        "val": [[25, 10], [25, 12], [25, 27], [42, 3], [42, 20], [42, 23],
                [47, 26], [47, 30], [47, 39]],
        "test_custom": [[i, j] for i in val_cams for j in train_lights],
    }
    pairs["val_add"] = pairs["val"] + [[10, 0], [10, 17], [27, 0], [27, 17]]

    for split, plist in pairs.items():
        out = {"k1": 0.0, "k2": 0.0, "k3": 0.0, "k4": 0.0, "p1": 0.0, "p2": 0.0,
               "is_fisheye": False, "frames": []}
        intr_param = None
        sample = None
        for index, (cam_id, light_id) in enumerate(plist):
            sample = rene[scene_name][light_id][cam_id]
            pose = sample["pose"]().astype(np.float32)  # c2w
            intrinsic = np.eye(4, dtype=np.float32)
            intrinsic[:3, :3] = sample["camera"]()["intrinsics"]["camera_matrix"]
            world_mat = intrinsic @ np.linalg.inv(pose)
            P = (world_mat @ scale_mat)[:3, :4]
            intr_param, c2w = decompose_P(P)
            pose_light = sample["light"]().astype(np.float32)
            pose_light[:, 3] = np.linalg.inv(scale_mat) @ pose_light[:, 3]
            frame = {
                "index": index,
                "file_path": f"lset{light_id:03d}/data/{cam_id:02d}_image.png",
                "light_index": light_id,
                "camera_index": cam_id,
                "transform_matrix": cv_to_gl(c2w).tolist(),
                "transform_matrix_light": cv_to_gl(pose_light).tolist(),
            }
            out["frames"].append(frame)
        img = sample["image"]()
        h, w = img.shape[:2]
        fl_x, fl_y = intr_param[0][0], intr_param[1][1]
        out.update({
            "camera_angle_x": math.atan(w / (fl_x * 2)) * 2,
            "camera_angle_y": math.atan(h / (fl_y * 2)) * 2,
            "fl_x": float(fl_x), "fl_y": float(fl_y),
            "cx": float(intr_param[0][2]), "cy": float(intr_param[1][2]),
            "sk_x": float(intr_param[0][1]), "sk_y": float(intr_param[1][0]),
            "w": int(w), "h": int(h),
            "aabb_scale": float(np.exp2(np.rint(np.log2(radius)))),
            "sphere_center": [0.0, 0.0, 0.0],
            "sphere_radius": 1.0,
            "bounding_box_aabb": bounding_box_aabb.tolist(),
            "radius_scale_mat": radius,
        })
        path = os.path.join(output_path, f"{split}_transforms.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True, help="ReNe raw dataset root")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--scenes", default="savannah,apple,garden,cube")
    args = parser.parse_args()
    try:
        from rene.utils.loaders import ReneDataset
    except ImportError:
        sys.exit("The 'rene' package is required to read raw ReNe captures. "
                 "Alternatively use the pre-converted annotations shipped with "
                 "the reference repo (dataset_rene/).")
    rene = ReneDataset(input_folder=args.dataset_path)
    for scene in args.scenes.split(","):
        out = os.path.join(args.output_root, scene)
        os.makedirs(out, exist_ok=True)
        rene_to_json(rene, scene, out)


if __name__ == "__main__":
    main()
