"""Shared-tap stencil encoding (ops/hashgrid.encode_stencil + model wiring).

The numerical-gradient tap evaluations (reference
projects/neuralangelo/utils/modules.py:115-178) share their hash-cell corners
with the center point at every level coarser than the tap spacing. These
tests pin the exactness contract of the fused stencil path:

  * shared_levels=0 is bit-exact with per-point `encode`;
  * at a shared level, taps that stay inside the center's cell are bit-exact;
  * the center evaluation is bit-exact regardless of offsets;
  * the table cotangent (the scatter-add this optimization collapses) matches
    the unshared path whenever taps stay in-cell;
  * the model-level path (eval_field_with_gradients) agrees with the exact
    configuration and trains.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.ops import hashgrid


SMALL = hashgrid.HashGridSpec(
    num_levels=4, features_per_level=2, log2_hashmap_size=12, min_logres=2, max_logres=5,
    range_min=-1.0, range_max=1.0,
)


def _rand_offsets(key, t, scale):
    return jax.random.uniform(key, (t, 3), minval=-scale, maxval=scale)


def test_stencil_exact_path_matches_encode():
    """shared_levels=0: every evaluation equals `encode` at that point."""
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_params(key, SMALL)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3), minval=-1, maxval=1)
    offsets = _rand_offsets(jax.random.PRNGKey(2), 4, 0.05)
    out = hashgrid.encode_stencil(table, pts, offsets, SMALL, shared_levels=0)
    assert out.shape == (5, 7, 5, SMALL.output_dim)
    pts_all = jnp.concatenate([pts[..., None, :], pts[..., None, :] + offsets], axis=-2)
    ref = hashgrid.encode(table, pts_all, SMALL)
    # Tap coordinates are normalized before adding the offset (one fewer
    # dependent op); the only deviation from `encode` is fp32 rounding.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=1e-8)
    # The center evaluation shares the exact arithmetic -> bit-exact.
    np.testing.assert_array_equal(np.asarray(out[..., 0, :]), np.asarray(ref[..., 0, :]))


def _in_cell_points(key, spec, n, margin=0.3):
    """Points whose fractional position is in [margin, 1-margin] at the
    FINEST level (hence strictly inside a cell at every coarser level too,
    away from all coarser cell faces by at least margin * finest cell)."""
    res = spec.resolutions[-1]
    kc, kf = jax.random.split(key)
    cells = jax.random.randint(kc, (n, 3), 0, res - 1)
    frac = jax.random.uniform(kf, (n, 3), minval=margin, maxval=1 - margin)
    x01 = (cells + frac) / (res - 1.0)
    return spec.range_min + x01 * (spec.range_max - spec.range_min)


def test_stencil_shared_exact_when_taps_in_cell():
    """Offsets smaller than the margin at the finest level keep every tap in
    the center's cell at EVERY level -> shared path is exact (fp32 tol)."""
    spec = SMALL
    key = jax.random.PRNGKey(3)
    table = hashgrid.init_params(key, spec)
    pts = _in_cell_points(jax.random.PRNGKey(4), spec, 64, margin=0.3)
    # finest cell extent in world units
    cell = (spec.range_max - spec.range_min) / (spec.resolutions[-1] - 1)
    offsets = _rand_offsets(jax.random.PRNGKey(5), 4, 0.2 * cell)
    out = hashgrid.encode_stencil(table, pts, offsets, spec,
                                  shared_levels=spec.num_levels)
    pts_all = jnp.concatenate([pts[..., None, :], pts[..., None, :] + offsets], axis=-2)
    ref = hashgrid.encode(table, pts_all, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6)


def test_stencil_center_bitexact_even_with_large_offsets():
    key = jax.random.PRNGKey(6)
    table = hashgrid.init_params(key, SMALL)
    pts = jax.random.uniform(jax.random.PRNGKey(7), (50, 3), minval=-1, maxval=1)
    offsets = _rand_offsets(jax.random.PRNGKey(8), 4, 0.5)  # many cells wide
    out = hashgrid.encode_stencil(table, pts, offsets, SMALL,
                                  shared_levels=SMALL.num_levels)
    ref = hashgrid.encode(table, pts, SMALL)
    np.testing.assert_array_equal(np.asarray(out[..., 0, :]), np.asarray(ref))


def test_stencil_table_gradients_match_when_in_cell():
    """The scatter-add the sharing collapses must deposit the same total
    cotangent into the table as the unshared path (in-cell case)."""
    spec = SMALL
    table = hashgrid.init_params(jax.random.PRNGKey(9), spec)
    pts = _in_cell_points(jax.random.PRNGKey(10), spec, 32, margin=0.3)
    cell = (spec.range_max - spec.range_min) / (spec.resolutions[-1] - 1)
    offsets = _rand_offsets(jax.random.PRNGKey(11), 4, 0.2 * cell)

    def loss_shared(tbl):
        out = hashgrid.encode_stencil(tbl, pts, offsets, spec,
                                      shared_levels=spec.num_levels)
        return jnp.sum(jnp.sin(out))

    def loss_ref(tbl):
        pts_all = jnp.concatenate(
            [pts[..., None, :], pts[..., None, :] + offsets], axis=-2)
        return jnp.sum(jnp.sin(hashgrid.encode(tbl, pts_all, spec)))

    g_shared = jax.grad(loss_shared)(table)
    g_ref = jax.grad(loss_ref)(table)
    for gs, gr in zip(g_shared, g_ref):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr), atol=1e-5)


def test_stencil_respects_level_mask_and_max_levels():
    table = hashgrid.init_params(jax.random.PRNGKey(12), SMALL)
    pts = jax.random.uniform(jax.random.PRNGKey(13), (8, 3), minval=-1, maxval=1)
    offsets = _rand_offsets(jax.random.PRNGKey(14), 4, 0.01)
    mask = hashgrid.active_levels_to_mask(2, SMALL.num_levels)
    out = hashgrid.encode_stencil(table, pts, offsets, SMALL, level_mask=mask,
                                  shared_levels=SMALL.num_levels)
    F = SMALL.features_per_level
    assert np.all(np.asarray(out[..., 2 * F:]) == 0)
    assert np.any(np.asarray(out[..., : 2 * F]) != 0)
    out_t = hashgrid.encode_stencil(table, pts, offsets, SMALL, max_levels=2,
                                    shared_levels=SMALL.num_levels)
    assert np.all(np.asarray(out_t[..., 2 * F:]) == 0)


def test_model_shared_levels_matches_exact_path(tmp_path):
    """eval_field_with_gradients with shared_levels on vs off: identical
    outputs when eps is far below the coarsest cell size."""
    from mlinerf_tpu.config import resolve
    from tests.test_train_e2e import tiny_lumen_cfg

    def build(shared):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=2)
        cfg.model.object.sdf.gradient.shared_levels = shared
        cfg.model.object.sdf.encoding.coarse2fine.enabled = False
        Trainer = resolve("trainer", cfg.trainer.type)
        return Trainer(cfg, seed=0, logdir=str(tmp_path / f"s{shared}"))

    tr0 = build(0)
    tr4 = build(4)
    # Points at in-cell positions of the model's own grid spec so every tap
    # stays inside the center cell (the regime where sharing is exact; the
    # finite-difference division by eps amplifies any cross-cell mismatch).
    from mlinerf_tpu.models.fields import make_hashgrid_spec

    spec = make_hashgrid_spec(tr0.cfg.model.object.sdf.encoding)
    pts = _in_cell_points(jax.random.PRNGKey(0), spec, 16, margin=0.3).reshape(1, 16, 3)
    outside = jnp.zeros(pts.shape[:-1], bool)
    for tr in (tr0, tr4):
        cond = dict(tr.make_cond(jnp.zeros((), jnp.int32)))
        # eps far smaller than the coarsest cell -> all taps stay in-cell
        cond["normal_eps"] = jnp.asarray(1e-4, jnp.float32)
        tr._stencil_out = tr.model.apply(
            {"params": tr.state.params}, pts, outside, cond, True,
            method=tr.model.eval_field_with_gradients)
    for a, b in zip(tr0._stencil_out, tr4._stencil_out):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5)
    jax.clear_caches()


def test_train_step_with_shared_levels(tmp_path):
    """A short training run with the stencil path on stays finite and learns."""
    from mlinerf_tpu.config import resolve
    from tests.test_train_e2e import tiny_lumen_cfg

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=6)
    cfg.model.object.sdf.gradient.shared_levels = 3
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "shared"))
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])
    assert np.isfinite(tr.losses_host["eikonal"])
    jax.clear_caches()


def test_shared_levels_auto_equals_explicit_cap_minus_one(tmp_path):
    """shared_levels='auto' with the window-static coarse2fine cap must train
    bitwise-identically to an explicit shared = cap-1 (the finest active
    level runs the exact per-tap path)."""
    import jax
    import numpy as np

    from mlinerf_tpu.config import resolve
    from tests.test_train_e2e import tiny_lumen_cfg

    params_by = {}
    for name, shared in (("auto", "auto"), ("explicit", 3)):
        cfg = tiny_lumen_cfg(tmp_path, stage="a", max_iter=4)
        cfg.logging_iter = 4
        # Freeze the active-level count at 4 for the whole run.
        cfg.model.object.sdf.encoding.coarse2fine.init_active_level = 4
        cfg.model.object.sdf.encoding.coarse2fine.step = 10**6
        cfg.model.object.sdf.gradient.shared_levels = shared
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"auto_{name}"))
        tr.train(arrays)
        assert tr._train_max_levels == 4
        params_by[name] = tr.state.params

    for a, b in zip(jax.tree.leaves(params_by["auto"]),
                    jax.tree.leaves(params_by["explicit"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exact_hessian_subset(tmp_path):
    """gradient.hessian.mode=exact: the curvature hessian comes from EXACT
    taps on a strided sample subset (shared-level tap features are linear in
    the offset, so the shared-tap hessian misses encoder curvature). With
    in-cell points + tiny eps the shared taps ARE exact, so the subset
    hessian must equal the full exact-path hessian at the subset indices."""
    from mlinerf_tpu.config import resolve
    from mlinerf_tpu.models.fields import make_hashgrid_spec
    from tests.test_train_e2e import tiny_lumen_cfg

    def build(shared, hmode, fraction=0.5):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=2)
        cfg.model.object.sdf.gradient.shared_levels = shared
        cfg.model.object.sdf.gradient.hessian = {"mode": hmode, "fraction": fraction}
        cfg.model.object.sdf.encoding.coarse2fine.enabled = False
        Trainer = resolve("trainer", cfg.trainer.type)
        return Trainer(cfg, seed=0, logdir=str(tmp_path / f"h_{shared}_{hmode}"))

    tr_exact = build(0, "shared")
    tr_fix = build(4, "exact", fraction=0.5)
    spec = make_hashgrid_spec(tr_exact.cfg.model.object.sdf.encoding)
    pts = _in_cell_points(jax.random.PRNGKey(0), spec, 16, margin=0.3).reshape(1, 16, 3)
    outside = jnp.zeros(pts.shape[:-1], bool)
    outs = {}
    for name, tr in (("exact", tr_exact), ("fix", tr_fix)):
        cond = dict(tr.make_cond(jnp.zeros((), jnp.int32)))
        cond["normal_eps"] = jnp.asarray(1e-4, jnp.float32)
        outs[name] = tr.model.apply(
            {"params": tr.state.params}, pts, outside, cond, True,
            method=tr.model.eval_field_with_gradients)
    h_exact, h_fix = outs["exact"][3], outs["fix"][3]
    assert h_fix.shape == (1, 8, 3)  # fraction=0.5 -> every 2nd sample
    np.testing.assert_allclose(np.asarray(h_fix), np.asarray(h_exact[:, ::2]),
                               rtol=1e-4, atol=2e-5)
    # Gradients stay full-shape (shared-tap path).
    assert outs["fix"][2].shape == (1, 16, 3)


def test_train_step_with_exact_hessian(tmp_path):
    """Training with the stencil + exact-hessian-subset stays finite and the
    curvature loss is live (nonzero weight path exercised end to end)."""
    from mlinerf_tpu.config import resolve
    from tests.test_train_e2e import tiny_lumen_cfg

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=4)
    cfg.model.object.sdf.gradient.shared_levels = 3
    cfg.model.object.sdf.gradient.hessian = {"mode": "exact", "fraction": 0.25}
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "hfix"))
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])
    assert np.isfinite(tr.losses_host.get("curvature", 0.0))
    jax.clear_caches()
