#!/usr/bin/env python
"""Convert a COLMAP sparse reconstruction to a transforms.json annotation.

Counterpart of ``projects/neuralangelo/scripts/convert_data_to_json.py``:
reads the COLMAP model directly (text or binary format, no pycolmap/colmap
binary needed), computes the bounding-sphere normalization from the camera
hull + sparse points, and writes the GL-convention ``transform_matrix`` per
frame expected by the ``lumen``/``neuralangelo`` datasets.
"""

import argparse
import json
import math
import os
import struct
import sys

import numpy as np


# ---------------------------------------------------------------------------
# COLMAP model readers (text + binary)
# ---------------------------------------------------------------------------


def read_cameras_text(path):
    cameras = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cam_id, model, w, h = int(parts[0]), parts[1], int(parts[2]), int(parts[3])
            params = [float(p) for p in parts[4:]]
            cameras[cam_id] = dict(model=model, width=w, height=h, params=params)
    return cameras


def read_cameras_binary(path):
    cameras = {}
    NPARAMS = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4, 9: 5, 10: 12}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            num = NPARAMS[model_id]
            params = struct.unpack(f"<{num}d", f.read(8 * num))
            model = {0: "SIMPLE_PINHOLE", 1: "PINHOLE", 2: "SIMPLE_RADIAL", 3: "RADIAL",
                     4: "OPENCV"}.get(model_id, str(model_id))
            cameras[cam_id] = dict(model=model, width=w, height=h, params=list(params))
    return cameras


def read_images_text(path):
    images = {}
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#") and l.strip()]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        img_id = int(parts[0])
        qw, qx, qy, qz, tx, ty, tz = (float(p) for p in parts[1:8])
        cam_id = int(parts[8])
        name = parts[9]
        images[img_id] = dict(q=[qw, qx, qy, qz], t=[tx, ty, tz], camera_id=cam_id, name=name)
    return images


def read_images_binary(path):
    images = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            img_id = struct.unpack("<i", f.read(4))[0]
            q = struct.unpack("<4d", f.read(32))
            t = struct.unpack("<3d", f.read(24))
            cam_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n2d,) = struct.unpack("<Q", f.read(8))
            f.read(24 * n2d)  # skip 2D points
            images[img_id] = dict(q=list(q), t=list(t), camera_id=cam_id,
                                  name=name.decode())
    return images


def read_points3d_binary(path):
    pts = []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            f.read(8)  # id
            xyz = struct.unpack("<3d", f.read(24))
            f.read(3 + 8)  # rgb + error
            (track_len,) = struct.unpack("<Q", f.read(8))
            f.read(8 * track_len)
            pts.append(xyz)
    return np.asarray(pts, np.float64)


def read_points3d_text(path):
    pts = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            pts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.asarray(pts, np.float64)


def qvec2rotmat(q):
    w, x, y, z = q
    return np.asarray([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def read_sparse_model(sparse_dir):
    """Read a COLMAP sparse model dir (binary or text) -> (cameras, images, points)."""
    sd = sparse_dir
    if os.path.exists(os.path.join(sd, "cameras.bin")):
        cameras = read_cameras_binary(os.path.join(sd, "cameras.bin"))
        images = read_images_binary(os.path.join(sd, "images.bin"))
        points = (read_points3d_binary(os.path.join(sd, "points3D.bin"))
                  if os.path.exists(os.path.join(sd, "points3D.bin")) else np.zeros((0, 3)))
    else:
        cameras = read_cameras_text(os.path.join(sd, "cameras.txt"))
        images = read_images_text(os.path.join(sd, "images.txt"))
        points = (read_points3d_text(os.path.join(sd, "points3D.txt"))
                  if os.path.exists(os.path.join(sd, "points3D.txt")) else np.zeros((0, 3)))
    return cameras, images, points


def export_transforms(cameras, images, output, images_dir="images",
                      sphere_center=None, sphere_radius=None, bounding_box=None):
    """Write the transforms.json annotation for a COLMAP model.

    Counterpart of the reference ``export_to_json``
    (projects/neuralangelo/scripts/convert_data_to_json.py): GL-convention
    camera-to-world matrices + shared pinhole intrinsics + scene
    normalization (sphere center/radius, optional AABB).
    """
    cam = cameras[next(iter(cameras))]
    if cam["model"] in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
        fx = fy = cam["params"][0]
        cx, cy = cam["params"][1], cam["params"][2]
    else:  # PINHOLE / OPENCV / RADIAL
        fx, fy, cx, cy = cam["params"][:4]
        if cam["model"] == "RADIAL":
            fx = fy = cam["params"][0]
            cx, cy = cam["params"][1], cam["params"][2]
    w, h = cam["width"], cam["height"]

    frames = []
    for img in sorted(images.values(), key=lambda x: x["name"]):
        R = qvec2rotmat(img["q"])  # w2c
        t = np.asarray(img["t"])
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        c2w_gl = c2w * np.asarray([1, -1, -1, 1])[None, :]  # CV -> GL columns
        frames.append({
            "file_path": os.path.join(images_dir, img["name"]),
            "transform_matrix": c2w_gl.tolist(),
        })

    out = {
        "camera_angle_x": math.atan(w / (fx * 2)) * 2,
        "camera_angle_y": math.atan(h / (fy * 2)) * 2,
        "fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy, "sk_x": 0.0, "sk_y": 0.0,
        "w": int(w), "h": int(h),
        "sphere_center": list(sphere_center) if sphere_center is not None else [0, 0, 0],
        "sphere_radius": float(sphere_radius) if sphere_radius is not None else 1.0,
        "frames": frames,
    }
    if bounding_box is not None:
        out["bounding_box_aabb"] = bounding_box
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    with open(output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {output}: {len(frames)} frames, radius {out['sphere_radius']:.3f}")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sparse_dir", required=True, help="COLMAP sparse/0 dir")
    parser.add_argument("--images_dir", default="images", help="image dir relative to scene root")
    parser.add_argument("--output", required=True, help="output transforms.json path")
    parser.add_argument("--scene_type", choices=["object", "indoor", "outdoor"], default="object")
    args = parser.parse_args()
    cameras, images, points = read_sparse_model(args.sparse_dir)

    # Scene normalization: center = camera-hull centroid (object scenes) or
    # sparse-point median; radius covers the cameras.
    centers = []
    for img in images.values():
        R = qvec2rotmat(img["q"])
        t = np.asarray(img["t"])
        centers.append(-R.T @ t)
    centers = np.asarray(centers)
    if args.scene_type == "object" and len(points):
        target = np.median(points, axis=0)
    else:
        target = centers.mean(axis=0)
    radius = float(np.linalg.norm(centers - target, axis=1).max())

    export_transforms(cameras, images, args.output, images_dir=args.images_dir,
                      sphere_center=target.tolist(), sphere_radius=radius)


if __name__ == "__main__":
    main()
