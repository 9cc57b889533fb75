"""Indirect-light hemisphere probe smoke test."""

import numpy as np
import pytest

from mlinerf_tpu.config import resolve
from mlinerf_tpu.pipelines.indirect_light import indirect_light_probe
from tests.test_train_e2e import tiny_lumen_cfg


def test_indirect_probe(tmp_path):
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=1)
    cfg.data.val.image_size = [16, 16]
    cfg.data.train.image_size = [16, 16]
    cfg.model.render.rand_rays_val = 256
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "probe"))
    tr.train(arrays)
    ds = Dataset(cfg, is_inference=True)
    sample = ds.get_full_sample(0)
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    out = indirect_light_probe(tr, data, (16, 16), probe_resolution=16, grid_fraction=0.5)
    mosaic = out["indirect_rgb"]
    assert mosaic.ndim == 3 and mosaic.shape[-1] == 3
    assert np.isfinite(mosaic).all()
    assert mosaic.shape[0] > 0 and mosaic.shape[1] > 0
