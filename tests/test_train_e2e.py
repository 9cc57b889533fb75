"""End-to-end training tests on the procedural synthetic scene (CPU).

Sizes are tuned to keep each test under ~1 min on CPU while still asserting
real learning signals (loss falls / PSNR rises) and the full two-stage
machinery (warm start, partial freezing, intrinsic losses).
"""

import os

import jax
import numpy as np
import pytest

from mlinerf_tpu.config import Config, resolve


def tiny_nerf_cfg(tmp_path, max_iter=60):
    cfg = Config(os.path.join(os.path.dirname(__file__), "..", "configs", "nerf_synthetic_low.yaml"))
    cfg.max_iter = max_iter
    cfg.logging_iter = max_iter // 3
    cfg.validation_iter = 10**9
    cfg.checkpoint.save_iter = 10**9
    cfg.checkpoint.save_latest_iter = 10**9
    cfg.model.rand_rays = 256
    cfg.model.rand_rays_val = 1024
    cfg.model.sample_intvs = 32
    cfg.model.mlp.layers_feat = [None, 64, 64, 64]
    cfg.model.mlp.layers_rgb = [None, 32, 3]
    cfg.model.mlp.skip = []
    cfg.model.posenc.L_3D = 6
    cfg.data.train.image_size = [32, 32]
    cfg.data.val.image_size = [32, 32]
    cfg.data.num_cameras = 6
    cfg.data.num_lights = 1
    return cfg


def tiny_lumen_cfg(tmp_path, stage="a", max_iter=6):
    name = f"syn_sphere_{stage}.yaml"
    cfg = Config(os.path.join(os.path.dirname(__file__), "..", "configs", name))
    cfg.max_iter = max_iter
    cfg.logging_iter = max(max_iter // 2, 1)
    cfg.validation_iter = 10**9
    cfg.checkpoint.save_iter = 10**9
    cfg.checkpoint.save_latest_iter = 10**9
    cfg.model.render.rand_rays = 64
    cfg.model.render.rand_rays_val = 512
    cfg.model.render.num_samples.coarse = 24
    cfg.model.render.num_samples.fine = 8
    cfg.model.render.num_sample_hierarchy = 1
    cfg.model.object.sdf.mlp.hidden_dim = 64
    cfg.model.object.rgb.mlp.hidden_dim = 64
    cfg.model.object.rgb.mlp.num_layers = 2
    cfg.model.object.sdf.encoding.levels = 4
    cfg.model.object.sdf.encoding.hashgrid.min_logres = 3
    cfg.model.object.sdf.encoding.hashgrid.max_logres = 6
    cfg.model.object.sdf.encoding.hashgrid.dict_size = 12
    cfg.model.object.sdf.encoding.hashgrid.dim = 2
    cfg.data.train.image_size = [32, 32]
    cfg.data.val.image_size = [32, 32]
    cfg.data.num_cameras = 4
    cfg.data.num_lights = 2
    return cfg


def test_nerf_learns(tmp_path):
    cfg = tiny_nerf_cfg(tmp_path, max_iter=60)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "nerf"))
    # capture loss at start and end via the metrics log
    tr.train(arrays)
    import json

    with open(os.path.join(str(tmp_path / "nerf"), "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    first, last = recs[0], recs[-1]
    assert np.isfinite(last["train/total_loss"])
    assert last["train/total_loss"] < first["train/total_loss"]
    assert last["train/psnr"] > first["train/psnr"]


def test_nerf_fine_sampling_learns(tmp_path):
    """Coarse+fine hierarchical NeRF (the nerf_blender configuration shape)."""
    cfg = tiny_nerf_cfg(tmp_path, max_iter=20)
    cfg.model.fine_sampling = True
    cfg.model.sample_intvs_fine = 16
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "fine"))
    tr.train(arrays)
    assert "render_fine" in tr.losses_host
    assert np.isfinite(tr.losses_host["render_fine"])
    # inference returns fine maps
    val_ds = Dataset(cfg, is_inference=True)
    sample = val_ds[0]
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    out = tr.render_image(data, cfg.data.val.image_size)
    assert "rgb_fine" in out and "depth_fine" in out


def test_nerf_validation_and_checkpoint_roundtrip(tmp_path):
    cfg = tiny_nerf_cfg(tmp_path, max_iter=10)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    val_ds = Dataset(cfg, is_inference=True)
    Trainer = resolve("trainer", cfg.trainer.type)
    logdir = str(tmp_path / "nerf")
    tr = Trainer(cfg, logdir=logdir)
    tr.train(arrays)
    psnr = tr.validate(val_ds, step=10)
    assert np.isfinite(psnr)
    tr.save_checkpoint()
    tr.checkpointer.wait()
    assert os.path.exists(os.path.join(logdir, "latest_checkpoint.txt"))
    tr2 = Trainer(cfg, logdir=logdir)
    assert tr2.load_checkpoint(resume=True)
    assert tr2.current_iteration == 10
    # params identical after round trip
    a = jax.tree.leaves(tr.state.params)
    b = jax.tree.leaves(tr2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lumen_two_stage_pipeline(tmp_path):
    # ---- stage a
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=4)
    Dataset = resolve("dataset", cfg.data.type)
    ds = Dataset(cfg)
    arrays = ds.as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    logdir_a = str(tmp_path / "stage_a")
    tr = Trainer(cfg, logdir=logdir_a)
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])
    assert "eikonal" in tr.losses_host and "curvature" in tr.losses_host
    tr.save_checkpoint()
    tr.checkpointer.wait()

    # ---- stage b: warm start, partial training, intrinsic losses
    cfgb = tiny_lumen_cfg(tmp_path, "b", max_iter=4)
    cfgb.model.use_pre_trained.pt_filename = os.path.join(logdir_a, "latest_checkpoint.txt")
    cfgb.data.train.pseudo_label.enabled = False
    dsb = Dataset(cfgb)
    arrays_b = dsb.as_arrays()
    dsb._cache.clear()
    dsb.load_iid = True
    refs, shas = [], []
    for i in range(len(dsb)):
        s = dsb.get_full_sample(i)
        refs.append(s["Ref"])
        shas.append(s["Sha"][..., :1])
    arrays_b["pseudo_ref"] = np.stack(refs)
    arrays_b["pseudo_sha"] = np.stack(shas)
    arrays_b["pseudo_visibility_certainty"] = np.ones_like(arrays_b["pseudo_sha"])
    TrainerB = resolve("trainer", cfgb.trainer.type)
    trb = TrainerB(cfgb, logdir=str(tmp_path / "stage_b"))
    sdf_before = jax.device_get(jax.tree.leaves(trb.state.params["neural_sdf"]))
    rgb_before = jax.device_get(jax.tree.leaves(trb.state.params["neural_rgb"]))
    trb.train(arrays_b)
    sdf_after = jax.device_get(jax.tree.leaves(trb.state.params["neural_sdf"]))
    rgb_after = jax.device_get(jax.tree.leaves(trb.state.params["neural_rgb"]))
    # SDF (and everything not matching partial keywords) frozen:
    assert all(np.array_equal(a, b) for a, b in zip(sdf_before, sdf_after))
    # RGB heads trained:
    assert any(not np.array_equal(a, b) for a, b in zip(rgb_before, rgb_after))
    # intrinsic losses present and finite
    for key in ("intrinsic", "regularize_re"):
        assert key in trb.losses_host and np.isfinite(trb.losses_host[key])


def test_lumen_inference_maps(tmp_path):
    cfg = tiny_lumen_cfg(tmp_path, "b", max_iter=1)
    cfg.model.use_pre_trained = None
    cfg.data.train.pseudo_label.enabled = False
    cfg.trainer.partial_grad = None
    cfg.optim.partial_training = None
    Dataset = resolve("dataset", cfg.data.type)
    val_ds = Dataset(cfg, is_inference=True)
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "inf"))
    sample = val_ds[0]
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    maps = tr.inference_outputs(data, cfg.data.val.image_size)
    H, W = cfg.data.val.image_size
    assert maps["rgb_map"].shape == (1, H, W, 3)
    for key in ("o_r_map", "o_s_map", "o_re_map", "normal_map", "depth_map", "opacity_map"):
        assert key in maps, key
    assert np.isfinite(maps["rgb_map"]).all()
