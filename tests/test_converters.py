"""Dataset converter scripts: DTU projection decomposition and TnT log poses.

Counterparts of the reference's convert_dtu_to_json.py / convert_tnt_to_json.py
(projects/neuralangelo/scripts/) exercised on synthesized inputs.
"""

import json
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import convert_dtu_to_json as dtu  # noqa: E402
import convert_tnt_to_json as tnt  # noqa: E402


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def test_decompose_projection_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        K = np.array([
            [800.0 + rng.uniform(-50, 50), rng.uniform(0, 2), 320.0],
            [0.0, 790.0 + rng.uniform(-50, 50), 240.0],
            [0.0, 0.0, 1.0],
        ])
        R = random_rotation(rng)  # w2c
        C = rng.uniform(-2, 2, 3)  # camera center
        t = -R @ C
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        intr, pose = dtu.decompose_projection(P)
        np.testing.assert_allclose(intr[:3, :3], K, atol=1e-6)
        np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-5)
        np.testing.assert_allclose(pose[:3, 3], C, atol=1e-5)


def test_decompose_projection_scaled():
    """Projective scale (world_mat @ scale_mat has arbitrary scale) must not
    change the recovered normalized K or pose."""
    rng = np.random.default_rng(1)
    K = np.diag([700.0, 700.0, 1.0])
    K[0, 2], K[1, 2] = 256.0, 256.0
    R = random_rotation(rng)
    C = np.array([0.5, -1.0, 2.0])
    P = K @ np.concatenate([R, (-R @ C)[:, None]], axis=1)
    for s in (3.7, -2.2):
        intr, pose = dtu.decompose_projection(s * P)
        np.testing.assert_allclose(intr[:3, :3], K, atol=1e-6)
        np.testing.assert_allclose(pose[:3, 3], C, atol=1e-6)


def _tiny_png(path, w=4, h=4):
    # Valid minimal grayscale PNG via zlib-compressed scanlines.
    import zlib
    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def test_dtu_scan_to_json(tmp_path):
    rng = np.random.default_rng(2)
    scan = tmp_path / "scan24"
    (scan / "image").mkdir(parents=True)
    K = np.eye(4)
    K[:3, :3] = [[420.0, 0.0, 2.0], [0.0, 420.0, 2.0], [0.0, 0.0, 1.0]]
    cams = {}
    poses = []
    for i in range(3):
        R = random_rotation(rng)
        C = rng.uniform(-1, 1, 3)
        w2c = np.eye(4)
        w2c[:3, :3], w2c[:3, 3] = R, -R @ C
        world_mat = K @ w2c
        scale = np.diag([2.0, 2.0, 2.0, 1.0])
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = scale
        poses.append((R, C))
        _tiny_png(str(scan / "image" / f"{i:03d}.png"))
    np.savez(scan / "cameras_sphere.npz", **cams)

    dtu.dtu_scan_to_json(str(scan))
    meta = json.loads((scan / "transforms.json").read_text())
    assert meta["w"] == 4 and meta["h"] == 4
    assert meta["aabb_scale"] == 2.0
    assert len(meta["frames"]) == 3
    np.testing.assert_allclose(meta["fl_x"], 420.0, rtol=1e-5)
    # Frame pose round-trips (after GL flip): the camera center of frame i is
    # the world-space center scaled into the unit sphere: inv(scale) @ C.
    for i, (R, C) in enumerate(poses):
        m = np.asarray(meta["frames"][i]["transform_matrix"])
        c2w_cv = dtu.cv_to_gl(m)  # GL->CV is its own inverse
        np.testing.assert_allclose(c2w_cv[:3, :3], R.T, atol=1e-5)
        np.testing.assert_allclose(c2w_cv[:3, 3], C / 2.0, atol=1e-5)


def test_rotmat2qvec_roundtrip():
    rng = np.random.default_rng(3)
    from mlinerf_tpu.utils import camera
    for _ in range(5):
        R = random_rotation(rng)
        q = tnt.rotmat2qvec(R)
        R2 = np.asarray(camera.q_to_R(np.asarray(q, np.float32)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def _write_log(path, poses_c2w):
    with open(path, "w") as f:
        for i, m in enumerate(poses_c2w):
            f.write(f"{i} {i} 0\n")
            for row in m:
                f.write(" ".join(str(x) for x in row) + "\n")


def test_tnt_convert_scene_no_colmap(tmp_path):
    rng = np.random.default_rng(4)
    scene = tmp_path / "Barn"
    (scene / "images_raw").mkdir(parents=True)
    poses_c2w = []
    for i in range(3):
        R = random_rotation(rng)
        C = rng.uniform(-3, 3, 3)
        m = np.eye(4)
        m[:3, :3], m[:3, 3] = R.T, C
        poses_c2w.append(m)
        (scene / "images_raw" / f"{i:05d}.jpg").write_bytes(b"fake")
    _write_log(str(scene / "Barn_COLMAP_SfM.log"), poses_c2w)
    # GT cloud (ascii ply) + alignment transform
    pts = rng.uniform(-1, 1, (300, 3))
    with open(scene / "Barn.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 300\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    np.savetxt(scene / "Barn_trans.txt", np.eye(4))

    tnt.convert_scene(str(scene), "Barn", run_colmap=False)

    # init files exist and parse as a COLMAP text model
    assert (scene / "sparse" / "cameras.txt").exists()
    assert (scene / "sparse" / "images.txt").exists()
    meta = json.loads((scene / "transforms.json").read_text())
    assert len(meta["frames"]) == 3
    assert meta["w"] == 1920 and abs(meta["fl_x"] - 0.6 * 1920) < 1e-6
    assert "bounding_box_aabb" in meta
    # sphere bound covers the subsampled cloud
    c = np.asarray(meta["sphere_center"])
    assert meta["sphere_radius"] >= np.linalg.norm(pts[::100] - c, axis=1).max()
    # pose round-trip through w2c + GL flip
    frames = {os.path.basename(fr["file_path"]): fr for fr in meta["frames"]}
    for i, m in enumerate(poses_c2w):
        got = np.asarray(frames[f"{i:05d}.jpg"]["transform_matrix"])
        got_cv = got * np.asarray([1, -1, -1, 1])[None, :]
        np.testing.assert_allclose(got_cv, m, atol=1e-5)


def test_load_ply_vertices_binary(tmp_path):
    pts = np.random.default_rng(5).uniform(-1, 1, (10, 3)).astype(np.float32)
    path = tmp_path / "c.ply"
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 10\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"property uchar red\n"
                b"end_header\n")
        for p in pts:
            f.write(struct.pack("<fffB", *p, 7))
    got = tnt.load_ply_vertices(str(path))
    np.testing.assert_allclose(got, pts, atol=1e-6)


def test_tnt_images_txt_rekeyed_by_db_ids(tmp_path):
    """images.txt must carry COLMAP's ACTUAL image ids, not sorted-name order
    (round-1 advisor finding: id mismatch silently pairs poses with the wrong
    frames in point_triangulator)."""
    import sqlite3

    poses = {f"im{i}.jpg": np.eye(4) for i in range(3)}
    out = str(tmp_path / "sparse")
    tnt.write_colmap_init_files(poses, out)
    # COLMAP assigned ids in a scrambled order:
    db_path = str(tmp_path / "database.db")
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE images (image_id INTEGER PRIMARY KEY, name TEXT)")
    scrambled = {"im0.jpg": 2, "im1.jpg": 3, "im2.jpg": 1}
    for name, img_id in scrambled.items():
        con.execute("INSERT INTO images VALUES (?, ?)", (img_id, name))
    con.commit()
    con.close()

    tnt.rewrite_images_txt_with_db_ids(db_path, out, poses)
    with open(os.path.join(out, "images.txt")) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    got = {ln[-1]: int(ln[0]) for ln in lines}
    assert got == scrambled
