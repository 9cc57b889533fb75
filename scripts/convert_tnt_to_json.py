#!/usr/bin/env python
"""Convert Tanks-and-Temples captures to transforms.json.

Counterpart of the reference ``projects/neuralangelo/scripts/convert_tnt_to_json.py``:
per scene it

1. reads the published ``{scene}_COLMAP_SfM.log`` camera trajectory,
2. writes COLMAP-format init files (``cameras.txt``/``images.txt``) so the
   poses can seed ``colmap point_triangulator`` (reference :30-85),
3. optionally runs the COLMAP feature/triangulation/undistort steps when the
   ``colmap`` binary is on PATH (skipped otherwise — they are environment
   tooling, not framework code),
4. aligns the ground-truth point cloud with the camera frame via
   ``{scene}_trans.txt`` and derives the bounding sphere + AABB
   (reference :159-169),
5. exports transforms.json from the triangulated sparse model (or, without
   COLMAP, directly from the log poses with the default TnT pinhole
   intrinsics, reference :99-103).

All pose/bounds math is pure numpy; the PLY reader handles ascii and
binary_little_endian vertex clouds (replacing the reference's trimesh use).
"""

import argparse
import json
import os
import shutil
import struct
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from convert_colmap_to_json import (  # noqa: E402
    export_transforms, read_sparse_model)


def rotmat2qvec(R):
    """Rotation matrix -> (w, x, y, z) quaternion (COLMAP convention)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return -q if q[0] < 0 else q


def load_colmap_log_poses(log_file, img_dir=None, tf="w2c"):
    """Read a TnT ``*_COLMAP_SfM.log`` trajectory.

    The format is blocks of 5 lines: ``idx valid _`` header then a 4x4 c2w
    matrix row per line (reference load_COLMAP_poses, :117-144). Returns
    {image_index: 4x4} for ``tf='c2w'`` or {image_name: w2c 4x4} otherwise.
    """
    with open(log_file) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    poses = {}
    idx = valid = None
    for i, line in enumerate(lines):
        if i % 5 == 0:
            parts = line.split()
            idx, valid = int(parts[0]), parts[1]
        elif valid != "-1":
            row = np.array([float(x) for x in line.split()])
            poses.setdefault(idx, np.eye(4))[i % 5 - 1, :] = row
    if tf == "c2w":
        return poses
    names = sorted(os.listdir(img_dir))
    return {names[k]: np.linalg.inv(v) for k, v in poses.items()}


def default_tnt_intrinsics(w=1920, h=1080):
    """TnT's assumed pinhole model: f = 0.6*w, principal point at center
    (reference convert_cam_dict_to_pinhole_dict, :99-103)."""
    return dict(w=w, h=h, fx=0.6 * w, fy=0.6 * w, cx=w / 2.0, cy=h / 2.0)


def write_colmap_init_files(poses_w2c, out_dir, intr=None):
    """Write cameras.txt / images.txt / points3D.txt seeding point_triangulator
    with known poses (reference create_init_files, :30-85)."""
    intr = intr or default_tnt_intrinsics()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write(f"1 RADIAL {intr['w']} {intr['h']} {intr['fx']} "
                f"{intr['cx']} {intr['cy']} 0 0\n")
    _write_images_txt(poses_w2c, out_dir,
                      {name: i for i, name in enumerate(sorted(poses_w2c), start=1)})
    open(os.path.join(out_dir, "points3D.txt"), "w").close()


def _write_images_txt(poses_w2c, out_dir, name2id):
    with open(os.path.join(out_dir, "images.txt"), "w") as f:
        for name in sorted(poses_w2c):
            if name not in name2id:
                continue
            W2C = poses_w2c[name]
            q = rotmat2qvec(W2C[:3, :3])
            t = W2C[:3, 3]
            f.write(f"{name2id[name]} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 {name}\n\n")


def rewrite_images_txt_with_db_ids(db_path, out_dir, poses_w2c):
    """Re-key images.txt by the ids COLMAP actually assigned.

    The init files are written before the database exists (sequential
    sorted-name ids); COLMAP may assign different ids at feature extraction,
    and point_triangulator matches images BY ID — a mismatch silently pairs
    log poses with the wrong frames (reference create_init_files reads the
    name->id map from the db, convert_tnt_to_json.py:63-75)."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        name2id = {name: img_id for img_id, name in
                   con.execute("SELECT image_id, name FROM images")}
    finally:
        con.close()
    _write_images_txt(poses_w2c, out_dir, name2id)


def load_ply_vertices(path):
    """Minimal PLY vertex reader (ascii / binary_little_endian)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_verts = 0
        props = []
        in_vertex = False
        for line in header:
            if line.startswith("element"):
                in_vertex = line.split()[1] == "vertex"
                if in_vertex:
                    n_verts = int(line.split()[2])
            elif line.startswith("property") and in_vertex:
                props.append((line.split()[1], line.split()[-1]))
        sizes = {"float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
                 "float64": ("d", 8), "uchar": ("B", 1), "uint8": ("B", 1),
                 "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4),
                 "short": ("h", 2), "ushort": ("H", 2)}
        if fmt == "ascii":
            rows = [f.readline().split()[:len(props)] for _ in range(n_verts)]
            arr = np.asarray(rows, np.float64)
        else:
            rec = "<" + "".join(sizes[t][0] for t, _ in props)
            stride = struct.calcsize(rec)
            raw = f.read(stride * n_verts)
            arr = np.asarray([struct.unpack_from(rec, raw, i * stride)
                              for i in range(n_verts)], np.float64)
        cols = {name: i for i, (_, name) in enumerate(props)}
        return arr[:, [cols["x"], cols["y"], cols["z"]]]


def load_transformation(trans_file):
    """4x4 alignment matrix, one row per line (reference :147-156)."""
    trans = np.eye(4)
    with open(trans_file) as f:
        for idx, line in enumerate(ln for ln in f if ln.strip()):
            trans[idx, :] = [float(x) for x in line.split()]
    return trans


def align_gt_with_cam(pts, trans):
    """Map GT points into the camera frame: p' = T^-1 p (reference :159-162)."""
    trans_inv = np.linalg.inv(trans)
    return pts @ trans_inv[:3, :3].T + trans_inv[:3, -1]


def compute_bound(pts):
    """Bounding sphere + AABB of a point set, radius padded 1%
    (reference :165-169)."""
    bounding_box = np.array([pts.min(axis=0), pts.max(axis=0)])
    center = bounding_box.mean(axis=0)
    radius = float(np.max(np.linalg.norm(pts - center, axis=-1)) * 1.01)
    return center, radius, bounding_box.T.tolist()


def _run(cmd):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def convert_scene(scene_path, scene, run_colmap=True):
    img_dir = os.path.join(scene_path, "images_raw")
    if not os.path.isdir(img_dir):
        raise FileNotFoundError(f"'images_raw' folder not found in {scene_path}")
    poses = load_colmap_log_poses(
        os.path.join(scene_path, f"{scene}_COLMAP_SfM.log"), img_dir)
    sfm_dir = os.path.join(scene_path, "sparse")
    write_colmap_init_files(poses, sfm_dir)

    have_colmap = run_colmap and shutil.which("colmap") is not None
    db = os.path.join(scene_path, "database.db")
    if have_colmap:
        _run(["colmap", "feature_extractor", "--database_path", db,
              "--image_path", img_dir, "--ImageReader.camera_model=RADIAL",
              "--ImageReader.single_camera=true"])
        _run(["colmap", "sequential_matcher", "--database_path", db])
        # Re-key images.txt by COLMAP's actual image ids before triangulating.
        rewrite_images_txt_with_db_ids(db, sfm_dir, poses)
        _run(["colmap", "point_triangulator", "--database_path", db,
              "--image_path", img_dir, "--input_path", sfm_dir,
              "--output_path", sfm_dir,
              "--Mapper.tri_ignore_two_view_tracks=true"])
        _run(["colmap", "bundle_adjuster", "--input_path", sfm_dir,
              "--output_path", sfm_dir,
              "--BundleAdjustment.refine_extrinsics=false"])
        _run(["colmap", "image_undistorter", "--image_path", img_dir,
              "--input_path", sfm_dir, "--output_path", scene_path,
              "--output_type", "COLMAP", "--max_image_size", "1500"])
    else:
        print("colmap binary unavailable/skipped — exporting log poses with "
              "default TnT intrinsics")

    # Scene bounds from the aligned ground-truth point cloud.
    center = radius = bounding_box = None
    trans_file = os.path.join(scene_path, f"{scene}_trans.txt")
    gt_ply = os.path.join(scene_path, f"{scene}.ply")
    if os.path.exists(trans_file) and os.path.exists(gt_ply):
        trans = load_transformation(trans_file)
        pts = load_ply_vertices(gt_ply)
        pts_aligned = align_gt_with_cam(pts, trans)
        center, radius, bounding_box = compute_bound(pts_aligned[::100])

    out_json = os.path.join(scene_path, "transforms.json")
    if have_colmap:
        cameras, images, _ = read_sparse_model(sfm_dir)
        export_transforms(cameras, images, out_json, images_dir="images",
                          sphere_center=center, sphere_radius=radius,
                          bounding_box=bounding_box)
    else:
        intr = default_tnt_intrinsics()
        cameras = {1: dict(model="RADIAL", width=intr["w"], height=intr["h"],
                           params=[intr["fx"], intr["cx"], intr["cy"], 0, 0])}
        images = {}
        for img_id, name in enumerate(sorted(poses), start=1):
            W2C = poses[name]
            images[img_id] = dict(q=list(rotmat2qvec(W2C[:3, :3])),
                                  t=list(W2C[:3, 3]), camera_id=1, name=name)
        export_transforms(cameras, images, out_json, images_dir="images_raw",
                          sphere_center=center, sphere_radius=radius,
                          bounding_box=bounding_box)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tnt_path", required=True,
                        help="Path to Tanks and Temples dataset root")
    parser.add_argument("--skip_colmap", action="store_true",
                        help="skip COLMAP triangulation even if installed")
    args = parser.parse_args()
    for scene in sorted(os.listdir(args.tnt_path)):
        scene_path = os.path.join(args.tnt_path, scene)
        if os.path.isdir(scene_path):
            convert_scene(scene_path, scene, run_colmap=not args.skip_colmap)


if __name__ == "__main__":
    main()
