"""Inference suite end-to-end: image dumps, relighting video, test_all_light
pseudo-label renders, and label generation — one tiny model, one pass."""

import os

import numpy as np
import pytest

from mlinerf_tpu.config import resolve
from mlinerf_tpu.pipelines import inference as inf
from mlinerf_tpu.pipelines.label_store import load_results_all
from mlinerf_tpu.pipelines.pseudo_label import generate_pseudo_labels
from tests.test_train_e2e import tiny_lumen_cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("inf_suite")
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=2)
    cfg.data.train.image_size = [24, 24]
    cfg.data.val.image_size = [24, 24]
    cfg.model.render.rand_rays_val = 288
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "log"))
    tr.train(arrays)
    val_ds = Dataset(cfg, is_inference=True)
    return cfg, tr, val_ds, tmp_path


def test_test_save(trained):
    cfg, tr, val_ds, tmp_path = trained
    out_dir = str(tmp_path / "imgs")
    inf.test_save(tr, val_ds, out_dir, image_size=cfg.data.val.image_size)
    files = os.listdir(out_dir)
    assert any("rgb_map" in f for f in files)
    assert any("normal_map" in f for f in files)
    assert any("_gt" in f for f in files)


def test_test_images_tag(trained):
    cfg, tr, val_ds, tmp_path = trained
    out_dir = str(tmp_path / "tags")
    inf.test_images(tr, val_ds, out_dir, setting_list=["c00l00"],
                    image_size=cfg.data.val.image_size)
    files = os.listdir(out_dir)
    assert any(f.startswith("c00l00_rgb_map") for f in files), files


def test_test_video(trained):
    cfg, tr, val_ds, tmp_path = trained
    out_dir = str(tmp_path / "video")
    path = inf.test_video(tr, val_ds, 0, 1, out_dir, video_content=("rgb", "gt"),
                          num_frames=3, image_size=cfg.data.val.image_size, fps=5)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_all_light_and_pseudo_labels(trained):
    cfg, tr, val_ds, tmp_path = trained
    out_dir = str(tmp_path / "lights")
    results = tr.test_all_light(val_ds, out_dir, dataset_type="unpair",
                                sample_num=2, seed=1, save_pngs=False)
    assert os.path.exists(os.path.join(out_dir, "results_all.npz"))
    loaded = load_results_all(os.path.join(out_dir, "results_all"))
    cam0 = loaded["0"]
    assert set(cam0.keys()) >= {"0", "1"}
    for key in ("rgb_render", "normal", "visibility", "normal_x_light", "inter_mask"):
        assert key in cam0["0"], key
        assert np.isfinite(cam0["0"][key]).all()
    labels = generate_pseudo_labels(loaded, setting="unpair")
    H, W = cfg.data.val.image_size
    for cam in labels:
        assert labels[cam]["pseudo_reflectance"].shape == (H, W, 3)
        assert np.isfinite(labels[cam]["pseudo_reflectance"]).all()


def test_windowed_inference_matches_chunked(tmp_path):
    """runtime.inference_chunks_per_dispatch: the windowed lax.map path must
    reproduce the per-chunk loop and the fused single-dispatch bit-for-bit
    (same programs over the same padded chunks)."""
    cfg = tiny_lumen_cfg(tmp_path, stage="a", max_iter=2)
    cfg.model.render.rand_rays_val = 192  # 32x32 image -> 6 chunks (last partial)
    Dataset = resolve("dataset", cfg.data.type)
    Trainer = resolve("trainer", cfg.trainer.type)
    val_ds = Dataset(cfg, is_inference=True)
    sample = val_ds[0]
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    data["idx"] = np.asarray([sample["idx"]])
    size = cfg.data.val.image_size

    outs = {}
    for name, runtime in (("fused", {"fused_inference": True}),
                          ("chunked", {"fused_inference": False}),
                          ("windowed", {"fused_inference": False,
                                        "inference_chunks_per_dispatch": 4})):
        cfg_v = tiny_lumen_cfg(tmp_path, stage="a", max_iter=2)
        cfg_v.model.render.rand_rays_val = 192
        cfg_v.runtime = dict(runtime)
        tr = Trainer(cfg_v, is_inference=True, seed=0, logdir=str(tmp_path / name))
        outs[name] = tr.render_image(data, size)

    for key in outs["fused"]:
        np.testing.assert_allclose(outs["chunked"][key], outs["fused"][key],
                                   atol=1e-5, err_msg=key)
        np.testing.assert_allclose(outs["windowed"][key], outs["fused"][key],
                                   atol=1e-5, err_msg=key)


def test_auto_inference_window_policy(tmp_path):
    """'auto' inference windowing must be keyed on config scale (round-4
    ADVICE): 32 chunks/dispatch only at the ladder-validated fast shape;
    the parity-heavy shapes (dict>=20 or >96 samples/ray) keep the
    round-1-validated 4; >4096-ray chunks fall back to the per-chunk loop;
    an explicit int always wins."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=1)
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "win"))

    enc = cfg.model.object.sdf.encoding.hashgrid
    rnd = cfg.model.render
    # fast shape: small dict, small sample budget
    enc.dict_size = 19
    rnd.num_samples.coarse = 32
    rnd.num_sample_hierarchy = 2
    rnd.num_samples.fine = 16
    assert tr._inference_window(4096) == 32
    # reference-parity dict -> heavy
    enc.dict_size = 22
    assert tr._inference_window(4096) == 4
    # heavy sample budget alone also triggers it
    enc.dict_size = 19
    rnd.num_samples.coarse = 64
    rnd.num_sample_hierarchy = 4
    assert tr._inference_window(4096) == 4
    # oversized chunk -> per-chunk loop regardless
    assert tr._inference_window(8192) == 1
    # post-training renders in the same process cap at the proven 4-chunk
    # window (round-5: 2/2 worker faults at w32 after an hour of training,
    # zero at w4; fresh render-only processes keep 32)
    rnd.num_samples.coarse = 32
    rnd.num_sample_hierarchy = 2
    tr._trained_in_process = True
    assert tr._inference_window(4096) == 4
    tr._trained_in_process = False
    assert tr._inference_window(4096) == 32
    # explicit int overrides everything
    cfg.runtime.inference_chunks_per_dispatch = 7
    assert tr._inference_window(8192) == 7
