"""Importance-subsampled encoder gradients (gradient.subsample).

The subsampled path evaluates all samples with stopped gradients, re-evaluates
the top-K compositing-weight samples (plus a strided coverage set)
differentiably, and merges by sample index
(models/neuralangelo.py eval_field_grad_subsampled). Contracts:

1. Forward LOSS VALUES are unchanged — the merged field values are the same
   numbers the full path computes (pass B re-evaluates the same points).
2. When the selection covers every sample (topk == num_samples), parameter
   gradients match the full path (it is the same backward, re-indexed).
3. With a strict subset, training still runs and losses stay finite (the
   quality effect is gated by scripts/quality_ab.py AB_STUDY=topk, not here).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import resolve
from tests.test_train_e2e import tiny_lumen_cfg


def _one_step(cfg, tmp_path, tag):
    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: jnp.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / tag))
    step = tr.build_train_step()
    state, info = step(tr.state, arrays, jax.random.PRNGKey(0))
    return state, jax.device_get(info)


def _cfg(tmp_path, enabled, topk=6, stride=4):
    cfg = tiny_lumen_cfg(tmp_path, stage="a", max_iter=2)
    sub = cfg.model.object.sdf.gradient.subsample
    sub.enabled = enabled
    sub.topk = topk
    sub.stride = stride
    return cfg


def test_forward_loss_values_unchanged(tmp_path):
    _, info_off = _one_step(_cfg(tmp_path, False), tmp_path, "off")
    _, info_on = _one_step(_cfg(tmp_path, True, topk=6, stride=4), tmp_path, "on")
    # Same params, same rays: the composited forward is the same numbers, so
    # the render/eikonal losses and PSNR agree to fp tolerance. (Curvature
    # differs by design: its mean runs over the selected subset.)
    for key in ("render", "eikonal"):
        np.testing.assert_allclose(
            info_off["losses"][key], info_on["losses"][key], rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        info_off["metrics"]["psnr"], info_on["metrics"]["psnr"], rtol=1e-5
    )


def test_full_cover_matches_exact_gradients(tmp_path):
    num_samples = 24 + 8  # coarse + fine*hier in tiny_lumen_cfg
    state_off, _ = _one_step(_cfg(tmp_path, False), tmp_path, "off_full")
    state_on, _ = _one_step(
        _cfg(tmp_path, True, topk=num_samples, stride=0), tmp_path, "cover"
    )
    # Full coverage selection => same backward, so one optimizer step lands on
    # the same parameters (scatter-add ordering differs; allow fp slack).
    leaves_off = jax.tree.leaves(state_off.params)
    leaves_on = jax.tree.leaves(state_on.params)
    assert len(leaves_off) == len(leaves_on)
    for a, b in zip(leaves_off, leaves_on):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-5,
        )


def test_subset_trains_finite(tmp_path):
    cfg = _cfg(tmp_path, True, topk=4, stride=8)
    cfg.max_iter = 6
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "subset"))
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])
    assert np.isfinite(tr.losses_host["curvature"])


def test_subset_under_stencil(tmp_path):
    cfg = _cfg(tmp_path, True, topk=6, stride=4)
    cfg.model.object.sdf.gradient.shared_levels = 4
    cfg.model.object.sdf.gradient.hessian.mode = "exact"
    _, info = _one_step(cfg, tmp_path, "stencil_sub")
    assert np.isfinite(info["losses"]["render"])
    assert np.isfinite(info["losses"]["curvature"])
