"""Corner-sampled backward table scatter (ops/hashgrid.corner_sampled_combine).

The estimator claims: forward identical to the exact trilinear combine, and
the table gradient is an UNBIASED one-row-per-point subsample of the exact
8-corner scatter-add. These tests pin both claims, including the stencil's
multi-eval case with out-of-cell (negative-weight) tap extrapolations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.ops import hashgrid


def _exact_combine(table_lv, idx, weights_all):
    feats = jnp.take(table_lv, idx.reshape(-1), axis=0).reshape(
        idx.shape[0], idx.shape[1], table_lv.shape[-1])
    return jnp.einsum("cpf,ecp->efp", feats, weights_all.astype(feats.dtype))


def _random_problem(key, E=1, S=32, P=48, F=4, signed_weights=False):
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (S, F), jnp.float32)
    idx = jax.random.randint(k2, (8, P), 0, S)
    if signed_weights:
        # Stencil-style: eval 0 is a valid trilinear (non-negative, sums to
        # 1); taps are out-of-cell extrapolations with signed weights that
        # still sum to 1 per point (the algebra (1-f)+f=1 holds unclamped).
        f = jax.random.uniform(k3, (E, 3, P), minval=-0.5, maxval=1.5)
        f = f.at[0].set(jnp.clip(f[0], 0.0, 1.0))
        corners = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                            for k in (0, 1)], np.float32)  # [8,3]
        w = jnp.ones((E, 8, P))
        for ax in range(3):
            d = corners[:, ax][None, :, None]  # [1,8,1]
            w = w * jnp.where(d == 1, f[:, ax][:, None, :], 1.0 - f[:, ax][:, None, :])
        weights = w
    else:
        w = jax.random.uniform(k3, (E, 8, P))
        weights = w / jnp.sum(w, axis=1, keepdims=True)
    return table, idx, weights


def test_forward_matches_exact():
    table, idx, weights = _random_problem(jax.random.PRNGKey(0), E=3, signed_weights=True)
    key = jax.random.PRNGKey(7)
    out = hashgrid.corner_sampled_combine(table, idx, weights, key)
    ref = _exact_combine(table, idx, weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("signed,k_samples,mode", [
    (False, 1, "center"), (True, 1, "center"), (True, 2, "center"),
    (False, 1, "cotangent"), (True, 1, "cotangent"), (True, 2, "cotangent"),
    (False, 1, "top1cot"), (True, 1, "top1cot"), (True, 2, "top1cot"),
])
def test_table_gradient_unbiased(signed, k_samples, mode):
    E = 5 if signed else 1
    table, idx, weights = _random_problem(
        jax.random.PRNGKey(1), E=E, signed_weights=signed)
    ct = jax.random.normal(jax.random.PRNGKey(2), (E, table.shape[1], idx.shape[1]))

    def loss_sampled(t, key):
        return jnp.sum(hashgrid.corner_sampled_combine(
            t, idx, weights, key, k_samples=k_samples, mode=mode) * ct)

    def loss_exact(t):
        return jnp.sum(_exact_combine(t, idx, weights) * ct)

    g_exact = jax.grad(loss_exact)(table)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4000))
    g_sampled = jax.vmap(jax.grad(loss_sampled), in_axes=(None, 0))(table, keys)
    g_mean = jnp.mean(g_sampled, axis=0)
    # Monte-Carlo tolerance: the estimator's per-row std is O(|g|); with 4000
    # samples the mean is within ~5 sigma/sqrt(N) of the truth.
    err = np.abs(np.asarray(g_mean - g_exact))
    scale = np.abs(np.asarray(g_exact)).max() + 1.0
    assert err.max() / scale < 0.12, err.max() / scale


def test_cotangent_mode_lower_variance_on_stencil():
    """On a stencil-style problem (signed tap weights), sampling corners from
    the cotangent norm must have (much) lower estimator variance than the
    center-weight heuristic — this variance gap is the mechanism behind the
    center mode's -3.73 dB sphere-gate collapse (PERF.md round-3)."""
    table, idx, weights = _random_problem(
        jax.random.PRNGKey(4), E=5, signed_weights=True)
    ct = jax.random.normal(jax.random.PRNGKey(5), (5, table.shape[1], idx.shape[1]))

    def grad_var(mode):
        def loss(t, key):
            return jnp.sum(hashgrid.corner_sampled_combine(
                t, idx, weights, key, mode=mode) * ct)

        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(800) + 1000)
        g = jax.vmap(jax.grad(loss), in_axes=(None, 0))(table, keys)
        return float(jnp.sum(jnp.var(g, axis=0)))

    v_cot, v_cen = grad_var("cotangent"), grad_var("center")
    assert v_cot < 0.5 * v_cen, (v_cot, v_cen)
    # Rao-Blackwellized top1cot (exact argmax row + one sampled residual row,
    # 2 rows/point) must in turn dominate plain cotangent sampling — the
    # majority of the gradient mass becomes deterministic.
    v_top = grad_var("top1cot")
    assert v_top < 0.5 * v_cot, (v_top, v_cot)


def test_top1cot_rows_and_exact_max_row():
    """top1cot scatters at most two distinct rows per point, and with a
    dominant corner the argmax row's contribution is exact (non-stochastic
    across keys)."""
    table, idx, weights = _random_problem(jax.random.PRNGKey(6), E=1)
    ct = jnp.ones((1, table.shape[1], idx.shape[1]))

    def loss(t, key):
        return jnp.sum(hashgrid.corner_sampled_combine(
            t, idx, weights, key, mode="top1cot") * ct)

    g = jax.grad(loss)(table, jax.random.PRNGKey(11))
    touched = int(jnp.sum(jnp.any(g != 0, axis=-1)))
    assert touched <= 2 * idx.shape[1]


def test_single_sample_rows():
    """The backward scatters at most one distinct row per point."""
    table, idx, weights = _random_problem(jax.random.PRNGKey(3), E=1)
    ct = jnp.ones((1, table.shape[1], idx.shape[1]))

    def loss(t, key):
        return jnp.sum(hashgrid.corner_sampled_combine(t, idx, weights, key) * ct)

    g = jax.grad(loss)(table, jax.random.PRNGKey(11))
    # With F constant cotangents, each point contributes val/q to exactly one
    # row: the number of touched rows is <= P (vs up to 8P for exact).
    touched = int(jnp.sum(jnp.any(g != 0, axis=-1)))
    assert touched <= idx.shape[1]


def test_exact_finest_levels_get_exact_gradients():
    """With corner_exact_finest=N, the finest N levels' table gradients match
    the exact path bitwise (no sampling), while coarser levels still sample."""
    spec = hashgrid.HashGridSpec(num_levels=3, features_per_level=2,
                                 log2_hashmap_size=8, min_logres=2, max_logres=4)
    table = tuple(t.astype(jnp.float32)
                  for t in hashgrid.init_params(jax.random.PRNGKey(0), spec))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (29, 3), minval=-1.0, maxval=1.0)

    def loss(t, **kw):
        return jnp.sum(hashgrid.encode(t, pts, spec, **kw) ** 2)

    g_exact = jax.grad(loss)(table)
    g_mixed = jax.grad(loss)(
        table, corner_key=jax.random.PRNGKey(3), corner_mode="top1cot",
        corner_exact_finest=1)
    # Finest level: bitwise exact.
    np.testing.assert_array_equal(np.asarray(g_mixed[-1]), np.asarray(g_exact[-1]))
    # Coarser levels: sampled (different from exact with overwhelming prob.).
    assert not np.array_equal(np.asarray(g_mixed[0]), np.asarray(g_exact[0]))


def test_encode_forward_identical_and_grad_runs():
    spec = hashgrid.HashGridSpec(num_levels=3, features_per_level=2,
                                 log2_hashmap_size=8, min_logres=2, max_logres=4)
    table = hashgrid.init_params(jax.random.PRNGKey(0), spec)
    table = tuple(t.astype(jnp.float32) for t in table)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-1.5, maxval=1.5)
    key = jax.random.PRNGKey(5)
    out_plain = hashgrid.encode(table, pts, spec)
    out_sampled = hashgrid.encode(table, pts, spec, corner_key=key)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_sampled),
                               rtol=1e-6, atol=1e-6)

    def loss(t):
        return jnp.sum(hashgrid.encode(t, pts, spec, corner_key=key) ** 2)

    g = jax.grad(loss)(table)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)


def test_encode_stencil_forward_identical():
    spec = hashgrid.HashGridSpec(num_levels=3, features_per_level=2,
                                 log2_hashmap_size=8, min_logres=2, max_logres=4)
    table = hashgrid.init_params(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (13, 3), minval=-1.0, maxval=1.0)
    offsets = jnp.asarray([[1, -1, -1], [-1, -1, 1], [-1, 1, -1], [1, 1, 1]],
                          jnp.float32) * 1e-2
    out_plain = hashgrid.encode_stencil(table, pts, offsets, spec, shared_levels=2)
    out_sampled = hashgrid.encode_stencil(table, pts, offsets, spec, shared_levels=2,
                                          corner_key=jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_sampled),
                               rtol=1e-6, atol=1e-6)


def test_train_step_with_corner_sample(tmp_path):
    """Tiny lumen train step runs end-to-end with corner sampling enabled."""
    from tests.test_train_e2e import tiny_lumen_cfg

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=4)
    cfg.model.object.sdf.gradient.corner_sample.enabled = True
    cfg.model.object.sdf.gradient.shared_levels = cfg.model.object.sdf.encoding.levels
    cfg.model.object.sdf.gradient.hessian.mode = "exact"
    cfg.model.object.sdf.gradient.hessian.fraction = 0.25

    import jax

    from mlinerf_tpu.config import resolve

    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: jnp.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, seed=0, logdir=str(tmp_path))
    loop = trainer.build_train_loop(4)
    # The loop donates its input state — snapshot the tables first. (A
    # single step is not enough: the encoder LR warms up from 0 at it=0.)
    t0 = [np.asarray(x).copy()
          for x in trainer.state.params["neural_sdf"]["hash_table"]]
    state, info = loop(trainer.state, arrays, jax.random.PRNGKey(0))
    assert np.isfinite(float(jax.device_get(info["total"])))
    # Hash tables actually received (sampled) gradient updates.
    t1 = [np.asarray(x) for x in state.params["neural_sdf"]["hash_table"]]
    assert any(not np.allclose(a, b) for a, b in zip(t0, t1))
