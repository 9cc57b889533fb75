#!/usr/bin/env python
"""Convert DTU scans (IDR-style ``cameras_sphere.npz``) to transforms.json.

Counterpart of the reference ``projects/neuralangelo/scripts/convert_dtu_to_json.py``
(:57-126): per scan, compose ``world_mat @ scale_mat`` into a 3x4 projection
matrix, decompose it into intrinsics + camera-to-world pose, convert CV->GL,
and emit the transforms.json the ``lumen``/``neuralangelo`` datasets read.

The reference decomposes with ``cv2.decomposeProjectionMatrix``; this
implementation uses a pure-numpy RQ factorization instead (no OpenCV
dependency), which produces the same K (normalized so K[2,2]=1), rotation,
and camera center.
"""

import argparse
import json
import math
import os
import re
from glob import glob

import numpy as np


def rq3(M):
    """RQ decomposition of a 3x3 matrix: M = U @ Q with U upper-triangular
    (positive diagonal) and Q orthonormal."""
    P = np.fliplr(np.eye(3))
    # Reverse rows of M, QR-decompose the transpose, then un-reverse.
    q, r = np.linalg.qr((P @ M).T)
    U = P @ r.T @ P
    Q = P @ q.T
    # Flip signs so diag(U) > 0 (absorb into Q to keep U @ Q = M).
    S = np.diag(np.sign(np.diag(U)))
    return U @ S, S @ Q


def decompose_projection(P):
    """Split a 3x4 projection P = K [R | t] into (K 4x4, c2w pose 4x4).

    Matches cv2.decomposeProjectionMatrix as used by the reference
    (convert_dtu_to_json.py:32-54): K normalized to K[2,2]=1, pose holds the
    camera-to-world rotation (R^T) and the camera center.
    """
    M = P[:3, :3]
    K, R = rq3(M)
    if np.linalg.det(R) < 0:  # projective scale ambiguity: flip both
        R = -R
        K = -K
        # restore positive diagonal of K by sign transfer
        S = np.diag(np.sign(np.diag(K)))
        K = K @ S
        R = S @ R
    center = -np.linalg.solve(M, P[:3, 3])
    K = K / K[2, 2]
    intr = np.eye(4)
    intr[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = center
    return intr, pose


def cv_to_gl(c2w):
    """OpenCV (right-down-forward) -> OpenGL (right-up-back) camera axes."""
    return c2w @ np.diag([1.0, -1.0, -1.0, 1.0])


def image_size(path):
    try:
        from PIL import Image
        with Image.open(path) as im:
            return im.size
    except ImportError:
        # PNG header fallback: width/height live at bytes 16..24 of the IHDR.
        with open(path, "rb") as f:
            head = f.read(24)
        if head[:8] != b"\x89PNG\r\n\x1a\n":
            raise RuntimeError(f"cannot determine size of non-PNG {path} without PIL")
        w, h = int.from_bytes(head[16:20], "big"), int.from_bytes(head[20:24], "big")
        return w, h


def dtu_scan_to_json(scene_path):
    camera_param = dict(np.load(os.path.join(scene_path, "cameras_sphere.npz")))
    images = sorted(glob(os.path.join(scene_path, "image/*.png")))
    if not images:
        raise RuntimeError(f"no image/*.png under {scene_path}")

    frames = []
    intr = scale_mat = None
    for idx, image in enumerate(images):
        world_mat = camera_param[f"world_mat_{idx}"]
        scale_mat = camera_param[f"scale_mat_{idx}"]
        P = (world_mat @ scale_mat)[:3, :4]
        intr, c2w = decompose_projection(P)
        frames.append({
            "file_path": "image/" + os.path.basename(image),
            "transform_matrix": cv_to_gl(c2w).tolist(),
        })

    fl_x, fl_y = intr[0][0], intr[1][1]
    cx, cy = intr[0][2], intr[1][2]
    w, h = image_size(images[-1])
    out = {
        "k1": 0.0, "k2": 0.0, "k3": 0.0, "k4": 0.0, "p1": 0.0, "p2": 0.0,
        "is_fisheye": False,
        "camera_angle_x": math.atan(w / (fl_x * 2)) * 2,
        "camera_angle_y": math.atan(h / (fl_y * 2)) * 2,
        "fl_x": float(fl_x), "fl_y": float(fl_y),
        "cx": float(cx), "cy": float(cy),
        "sk_x": float(intr[0][1]), "sk_y": float(intr[1][0]),
        "w": int(w), "h": int(h),
        # power of two, for INGP resolution computation (reference :118)
        "aabb_scale": float(np.exp2(np.rint(np.log2(float(scale_mat[0, 0]))))),
        "sphere_center": [0.0, 0.0, 0.0],
        "sphere_radius": 1.0,
        "frames": frames,
    }
    out_path = os.path.join(scene_path, "transforms.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", out_path, f"({len(frames)} frames)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtu_path", required=True, help="root holding scan*/ dirs")
    args = parser.parse_args()
    for scene in sorted(os.listdir(args.dtu_path)):
        scene_path = os.path.join(args.dtu_path, scene)
        if os.path.isdir(scene_path) and re.search(r"scan", scene):
            dtu_scan_to_json(scene_path)


if __name__ == "__main__":
    main()
