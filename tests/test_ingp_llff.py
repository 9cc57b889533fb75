"""Tests for the two previously-untested families (round-3 verdict item 7):

* ``data/llff.py`` — poses_bounds.npy parsing semantics vs the reference
  loader (projects/nerf/datasets/nerf_llff.py:25-140): LLFF [-up right back]
  column order, bd_factor=0.75 rescale, average-pose recentering, val split,
  intrinsics rescale on image resize.
* ``models/ingp.py`` — the hash-grid NeRF variant trains (loss falls, PSNR
  rises) and renders, mirroring test_nerf_learns.
"""

import json
import os

import numpy as np
import pytest

from mlinerf_tpu.config import Config, resolve
from tests.test_train_e2e import tiny_nerf_cfg


# ---------------------------------------------------------------------------
# LLFF fixture
# ---------------------------------------------------------------------------


def _look_at_c2w_gl(cam_pos, target):
    """[3,4] camera-to-world in the [right up back] (OpenGL-ish) convention
    the LLFF pipeline produces after its column swap."""
    cam_pos = np.asarray(cam_pos, np.float64)
    back = cam_pos - np.asarray(target, np.float64)
    back /= np.linalg.norm(back)
    up0 = np.asarray([0.0, 0.0, 1.0])
    right = np.cross(up0, back)
    right /= np.linalg.norm(right)
    up = np.cross(back, right)
    return np.stack([right, up, back, cam_pos], axis=1)  # [3,4]


def _write_llff_scene(root, n=16, H=12, W=16, near=2.0, far=6.0):
    """Minimal LLFF capture: images/ + poses_bounds.npy ([N,17]).

    The stored pose layout is [-up, right, back, t] (what the reference's
    ``poses_raw[..., 0], poses_raw[..., 1] = poses[..., 1], -poses[..., 0]``
    swap inverts), with the hwf column appended.
    """
    from mlinerf_tpu.utils.image_io import save_image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rows = []
    rng = np.random.default_rng(0)
    raw_H, raw_W, focal = 3024.0, 4032.0, 3000.0
    for i in range(n):
        ang = 0.3 * (i / n - 0.5)
        cam_pos = [4.0 * np.sin(ang), 0.3 * rng.uniform(-1, 1), 4.0 * np.cos(ang)]
        c2w = _look_at_c2w_gl(cam_pos, target=[0, 0, 0])
        right, up, back, t = c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3]
        stored = np.stack([-up, right, back, t], axis=1)  # [3,4]
        hwf = np.asarray([raw_H, raw_W, focal])[:, None]
        rows.append(np.concatenate([stored, hwf], axis=1).reshape(-1).tolist()
                    + [near + 0.1 * i, far + 0.1 * i])
        img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        save_image(os.path.join(root, "images", f"img_{i:03d}.png"), img)
    np.save(os.path.join(root, "poses_bounds.npy"),
            np.asarray(rows, np.float64))


def _llff_cfg(root, H=12, W=16):
    cfg = Config(os.path.join(os.path.dirname(__file__), "..", "configs", "nerf_llff.yaml"))
    cfg.data.root = str(root)
    cfg.data.train.image_size = [H, W]
    cfg.data.val.image_size = [H, W]
    for split in ("train", "val"):
        cfg.data[split]["subset"] = None
    return cfg


def test_llff_parsing_semantics(tmp_path):
    root = tmp_path / "llff"
    _write_llff_scene(str(root), n=16)
    cfg = _llff_cfg(str(root))
    Dataset = resolve("dataset", cfg.data.type)
    train_ds = Dataset(cfg)
    val_ds = Dataset(cfg, is_inference=True)
    # Split: every val_ratio-th view held out, partition is exact.
    ratio = cfg.data.get("val_ratio", 8)
    assert len(val_ds) == int(np.ceil(16 / ratio))
    assert len(train_ds) + len(val_ds) == 16
    # bd_factor rescale: min bound lands at 1/0.75 (reference
    # scale = 1./(bounds.min()*0.75)).
    assert np.isclose(train_ds.bounds.min(), 1.0 / 0.75, atol=1e-5)
    # Recentering: the average camera center sits at the origin and the
    # average viewing frame aligns with the identity (reference
    # center_camera_poses semantics).
    centers = train_ds.c2ws[:, :3, 3]
    all_centers = np.concatenate([centers, val_ds.c2ws[:, :3, 3]])
    # both splits share the global recentering (computed over all poses)
    assert np.abs(np.mean(all_centers, axis=0)).max() < 0.3
    sample = train_ds.get_full_sample(0)
    assert sample["image"].shape == (12, 16, 3)
    # w2c pose is a rigid transform.
    R = sample["pose"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # Intrinsics: focal rescaled by the resize factor per axis.
    assert np.isclose(sample["intr"][0, 0], 3000.0 * 16 / 4032.0, rtol=1e-5)
    assert np.isclose(sample["intr"][1, 1], 3000.0 * 12 / 3024.0, rtol=1e-5)


def test_llff_image_pose_count_mismatch_raises(tmp_path):
    root = tmp_path / "llff_bad"
    _write_llff_scene(str(root), n=9)
    os.remove(os.path.join(str(root), "images", "img_008.png"))
    cfg = _llff_cfg(str(root))
    Dataset = resolve("dataset", cfg.data.type)
    with pytest.raises(AssertionError, match="mismatch"):
        Dataset(cfg)


def test_llff_arrays_feed_nerf_trainer(tmp_path):
    """LLFF arrays run through the NeRF train step (NDC-compatible path)."""
    root = tmp_path / "llff"
    _write_llff_scene(str(root), n=8, H=16, W=16)
    cfg = _llff_cfg(str(root), H=16, W=16)
    cfg.max_iter = 4
    cfg.logging_iter = 2
    cfg.validation_iter = 10**9
    cfg.checkpoint.save_iter = 10**9
    cfg.checkpoint.save_latest_iter = 10**9
    cfg.model.rand_rays = 64
    cfg.model.sample_intvs = 16
    cfg.model.fine_sampling = False
    cfg.model.mlp.layers_feat = [None, 32, 32]
    cfg.model.mlp.layers_rgb = [None, 16, 3]
    cfg.model.mlp.skip = []
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "run"))
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])


# ---------------------------------------------------------------------------
# Instant-NGP
# ---------------------------------------------------------------------------


def _tiny_ingp_cfg(tmp_path, max_iter=60):
    cfg = tiny_nerf_cfg(tmp_path, max_iter=max_iter)
    cfg.model.type = "ingp"
    cfg.model.posenc["hashgrid"] = {
        "levels": 4,
        "min_logres": 2,
        "max_logres": 5,
        "dict_size": 12,
        "dim": 2,
        "range": [-3, 3],
    }
    cfg.model.posenc.L_3D = 0
    return cfg


def test_ingp_learns(tmp_path):
    """Hash-grid NeRF trains on the synthetic scene: loss falls, PSNR rises,
    and the hash tables receive gradient updates (mirrors test_nerf_learns)."""
    cfg = _tiny_ingp_cfg(tmp_path, max_iter=60)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "ingp"))
    t0 = [np.asarray(x).copy() for x in
          jax_tree_find_tables(tr.state.params)]
    tr.train(arrays)
    with open(os.path.join(str(tmp_path / "ingp"), "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    first, last = recs[0], recs[-1]
    assert np.isfinite(last["train/total_loss"])
    assert last["train/total_loss"] < first["train/total_loss"]
    assert last["train/psnr"] > first["train/psnr"]
    t1 = jax_tree_find_tables(tr.state.params)
    assert any(not np.allclose(a, np.asarray(b)) for a, b in zip(t0, t1))


def jax_tree_find_tables(params):
    import jax

    leaves = []

    def visit(path, x):
        if "hash_table" in "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path):
            leaves.append(x)
        return x

    jax.tree_util.tree_map_with_path(visit, params)
    return leaves


def test_ingp_renders_image(tmp_path):
    cfg = _tiny_ingp_cfg(tmp_path, max_iter=6)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "ingp"))
    tr.train(arrays)
    val_ds = Dataset(cfg, is_inference=True)
    sample = val_ds[0]
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    out = tr.render_image(data, cfg.data.val.image_size)
    rgb = np.asarray(out["rgb"])
    assert rgb.shape[-2:] == (32 * 32, 3) or rgb.shape[-3:] == (32, 32, 3)
    assert np.all(np.isfinite(rgb))
