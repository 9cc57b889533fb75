"""Static coarse2fine level truncation must be bitwise-neutral.

The binary level_mask (models/neuralangelo.py:55-63) already zeroes inactive
hash levels; the window-static ``max_levels`` cap lets the encoder skip them
entirely. Training with the cap must walk the exact same state trajectory as
the masked-only path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import resolve
from tests.test_train_e2e import tiny_lumen_cfg


def _trained_params(cfg, tmp_path, tag):
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / tag))
    tr.train(arrays)
    return tr, tr.state.params


def test_static_truncation_matches_masked(tmp_path):
    # coarse2fine: init_active_level=2 of 4 levels, growing at step=4 — the
    # 8-iter run spans a level-growth boundary, so the cap changes mid-run.
    def cfg_with(trunc):
        cfg = tiny_lumen_cfg(tmp_path, stage="a", max_iter=8)
        cfg.logging_iter = 4
        cfg.model.object.sdf.encoding.coarse2fine.init_active_level = 2
        cfg.model.object.sdf.encoding.coarse2fine.step = 4
        cfg.trainer.static_level_truncation = trunc
        return cfg

    tr_off, params_off = _trained_params(cfg_with(False), tmp_path, "masked")
    tr_on, params_on = _trained_params(cfg_with(True), tmp_path, "trunc")
    assert tr_off._train_max_levels is None
    assert tr_on._train_max_levels is not None
    leaves_off = jax.tree.leaves(params_off)
    leaves_on = jax.tree.leaves(params_on)
    assert len(leaves_off) == len(leaves_on)
    for a, b in zip(leaves_off, leaves_on):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7)


def test_static_cap_mirrors_make_cond_schedule(tmp_path):
    """Host-side static_max_levels_for == traced active_levels at every iter."""
    cfg = tiny_lumen_cfg(tmp_path, stage="a", max_iter=40)
    cfg.model.object.sdf.encoding.coarse2fine.init_active_level = 2
    cfg.model.object.sdf.encoding.coarse2fine.step = 7
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "sched"))
    for it in range(0, 40, 3):
        cond = tr.make_cond(jnp.asarray(it, jnp.int32))
        assert tr.static_max_levels_for(it) == int(cond["active_levels"]), it


def test_cap_never_below_mask(tmp_path):
    """Within a window ending at it_end, the cap covers every step's mask."""
    cfg = tiny_lumen_cfg(tmp_path, stage="a", max_iter=100)
    cfg.model.object.sdf.encoding.coarse2fine.init_active_level = 1
    cfg.model.object.sdf.encoding.coarse2fine.step = 9
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "cap"))
    for start in range(0, 90, 10):
        cap = tr.static_max_levels_for(start + 10 - 1)
        for it in range(start, start + 10):
            assert cap >= int(tr.make_cond(jnp.asarray(it))["active_levels"])
