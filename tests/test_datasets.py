"""Dataset loader tests against generated on-disk fixtures: pose conventions
(GL->CV), sphere normalization, intrinsics rescaling, pseudo-label loading."""

import json
import os

import numpy as np
import pytest

from mlinerf_tpu.config import Config, resolve
from mlinerf_tpu.data.blender import gl_to_cv, invert_pose
from mlinerf_tpu.utils.image_io import save_image


def write_png(path, H=8, W=8, channels=4):
    img = np.random.default_rng(0).uniform(0, 1, (H, W, channels)).astype(np.float32)
    from PIL import Image

    arr = (img * 255).astype(np.uint8)
    Image.fromarray(arr, mode="RGBA" if channels == 4 else "RGB").save(path)
    return img


def make_c2w_gl(cam_pos):
    """A GL-convention c2w (x right, y up, z backward) looking at origin."""
    cam_pos = np.asarray(cam_pos, np.float32)
    forward_cv = -cam_pos / np.linalg.norm(cam_pos)  # CV z: toward origin
    up = np.asarray([0, 0, 1], np.float32)
    right = np.cross(forward_cv, up)
    right /= np.linalg.norm(right)
    down = np.cross(forward_cv, right)
    R_c2w_cv = np.stack([right, down, forward_cv], axis=1)  # columns
    c2w_cv = np.eye(4, dtype=np.float32)
    c2w_cv[:3, :3] = R_c2w_cv
    c2w_cv[:3, 3] = cam_pos
    # CV -> GL: negate y,z columns
    c2w_gl = c2w_cv * np.asarray([1, -1, -1, 1])[None, :]
    return c2w_gl


def test_lumen_dataset_roundtrip(tmp_path):
    """Write a transforms.json with known GL poses + lights; the loaded w2c
    pose must place the camera at the (normalized) expected world position."""
    root = tmp_path / "scene"
    root.mkdir()
    H = W = 8
    cam_positions = [[2.0, 0.0, 1.0], [0.0, 2.0, 1.0]]
    light_positions = [[1.0, 1.0, 2.0], [-1.0, 1.0, 2.0]]
    frames = []
    for i, (cp, lp) in enumerate(zip(cam_positions, light_positions)):
        fname = f"img_{i}.png"
        write_png(str(root / fname))
        light_gl = np.eye(4, dtype=np.float32)
        light_gl[:3, 3] = lp
        light_gl = light_gl * np.asarray([1, -1, -1, 1])[None, :]  # CV->GL
        frames.append({
            "file_path": fname,
            "camera_index": i,
            "light_index": 0,
            "transform_matrix": make_c2w_gl(cp).tolist(),
            "transform_matrix_light": light_gl.tolist(),
        })
    meta = {
        "fl_x": 10.0, "fl_y": 10.0, "cx": W / 2, "cy": H / 2,
        "sk_x": 0.0, "sk_y": 0.0,
        "sphere_center": [0.0, 0.0, 0.0], "sphere_radius": 2.0,
        "frames": frames,
    }
    with open(root / "train_transforms.json", "w") as f:
        json.dump(meta, f)

    cfg = Config()
    cfg.data = {
        "type": "lumen", "root": str(root), "preload": True, "num_workers": 1,
        "train": {"image_size": [H, W], "batch_size": 1,
                  "annotation": str(root / "train_transforms.json")},
        "val": {"image_size": [H, W], "batch_size": 1},
        "readjust": None,
    }
    cfg.model = {"type": "lumen", "render": {"rand_rays": 4}}
    Dataset = resolve("dataset", "lumen")
    ds = Dataset(cfg)
    assert len(ds) == 2
    s = ds.get_full_sample(0)
    # camera center = -R^T t must equal cam_pos / sphere_radius
    R, t = s["pose"][:3, :3], s["pose"][:3, 3]
    center = -R.T @ t
    np.testing.assert_allclose(center, np.asarray(cam_positions[0]) / 2.0, atol=1e-5)
    # camera looks at the origin: forward axis (row 2 of R) points from the
    # camera toward the origin
    fwd = R[2]
    expect_dir = -center / np.linalg.norm(center)
    np.testing.assert_allclose(fwd, expect_dir, atol=1e-5)
    # light center
    Rl, tl = s["pose_light"][:3, :3], s["pose_light"][:3, 3]
    light_center = -Rl.T @ tl
    np.testing.assert_allclose(light_center, np.asarray(light_positions[0]) / 2.0, atol=1e-5)
    # tag lookup
    assert ds.find_idx_cam_light("c01l00") == 1
    # arrays export
    arrays = ds.as_arrays()
    assert arrays["images"].shape == (2, H, W, 3)
    assert arrays["pose_light"].shape == (2, 3, 4)


def test_lumen_blender_pl_pos(tmp_path):
    """pl_pos point lights: identity rotation, translated + normalized."""
    root = tmp_path / "scene"
    root.mkdir()
    H = W = 8
    write_png(str(root / "r_0Img.png"))
    frames = [{
        "file_path": "r_0",
        "transform_matrix": make_c2w_gl([3.0, 0, 1.0]).tolist(),
        "pl_pos": [1.0, -2.0, 3.0],
    }]
    meta = {"camera_angle_x": 0.8, "sphere_center": [0, 0, 0], "sphere_radius": 1.0,
            "frames": frames}
    with open(root / "train_transforms.json", "w") as f:
        json.dump(meta, f)
    cfg = Config()
    cfg.data = {
        "type": "lumen_blender", "root": str(root), "preload": True, "num_workers": 1,
        "white_background": True,
        "train": {"image_size": [H, W], "batch_size": 1, "load_iid": False,
                  "annotation": str(root / "train_transforms.json")},
        "val": {"image_size": [H, W], "batch_size": 1, "load_iid": False},
        "readjust": None,
    }
    cfg.model = {"type": "lumen", "render": {"rand_rays": 4}}
    Dataset = resolve("dataset", "lumen_blender")
    ds = Dataset(cfg)
    s = ds.get_full_sample(0)
    Rl, tl = s["pose_light"][:3, :3], s["pose_light"][:3, 3]
    light_center = -Rl.T @ tl
    # GL->CV negates the y/z direction COLUMNS only — the translation column
    # is untouched (reference _gl_to_cv, projects/neuralangelo/data.py:143),
    # so the light center equals pl_pos.
    np.testing.assert_allclose(light_center, [1.0, -2.0, 3.0], atol=1e-5)
    # white background compositing applied (RGBA source)
    assert s["image"].shape == (H, W, 3)


def test_nerf_blender_loader(tmp_path):
    root = tmp_path / "lego"
    root.mkdir()
    H = W = 8
    write_png(str(root / "r_0.png"))
    meta = {"camera_angle_x": 0.7,
            "frames": [{"file_path": "r_0", "transform_matrix": make_c2w_gl([2, 1, 1]).tolist()}]}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    cfg = Config()
    cfg.data = {
        "type": "nerf_blender", "root": str(root), "preload": True, "num_workers": 1,
        "train": {"image_size": [H, W], "batch_size": 1},
        "val": {"image_size": [H, W], "batch_size": 1},
    }
    Dataset = resolve("dataset", "nerf_blender")
    ds = Dataset(cfg)
    s = ds.get_full_sample(0)
    assert s["image"].shape == (H, W, 3)
    focal = 0.5 * W / np.tan(0.35)
    np.testing.assert_allclose(s["intr"][0, 0], focal, rtol=1e-5)


def test_synthetic_cluttered_scene():
    """The multi-object stress scene: exact R*S identity, cast shadows
    present, geometry inside the unit bounding sphere, cfg plumbing."""
    from mlinerf_tpu.data.synthetic import (
        CLUTTERED_SPHERES, look_at_pose, render_cluttered_image)

    H = W = 48
    focal = 1.2 * max(H, W)
    intr = np.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    pose = look_at_pose(np.asarray([2.0, 0.8, 1.0], np.float32))
    light = np.asarray([1.2, -0.9, 1.4], np.float32)
    img, ref, sha, mask = render_cluttered_image(pose, intr, light, (H, W))
    fg = mask[..., 0] > 0
    assert 0.05 < fg.mean() < 0.6
    np.testing.assert_allclose(img[fg], (ref * sha)[fg], atol=1e-6)
    # hard shadows / terminator: some foreground is fully dark, some lit
    assert (sha[fg][:, 0] == 0).any() and (sha[fg][:, 0] > 0.5).any()
    # scene fits inside the unit bounding sphere (data normalization relies
    # on it)
    extent = np.linalg.norm(CLUTTERED_SPHERES[:, :3], axis=1) + CLUTTERED_SPHERES[:, 3]
    assert extent.max() < 1.0
    # dataset-level plumbing: cfg.data.scene switches the renderer and the
    # image actually differs from the single-sphere default
    cfg = Config()
    cfg.data = {
        "type": "synthetic", "num_cameras": 2, "num_lights": 1,
        "scene": "cluttered", "preload": True, "num_workers": 1,
        "train": {"image_size": [H, W], "batch_size": 1},
        "val": {"image_size": [H, W], "batch_size": 1},
    }
    Dataset = resolve("dataset", "synthetic")
    ds = Dataset(cfg)
    s = ds.get_full_sample(0)
    assert s["image"].shape == (H, W, 3)
    cfg.data.scene = "sphere"
    s_sphere = Dataset(cfg).get_full_sample(0)
    assert np.abs(s["image"] - s_sphere["image"]).max() > 0.1
