import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.ops import hashgrid


SMALL = hashgrid.HashGridSpec(
    num_levels=4, features_per_level=2, log2_hashmap_size=12, min_logres=2, max_logres=5,
    range_min=-1.0, range_max=1.0,
)


def test_spec_resolutions():
    spec = hashgrid.HashGridSpec()  # defaults mirror the neuralangelo config
    res = spec.resolutions
    # r_min * g^15 = 2048 exactly in real arithmetic; float rounding makes
    # floor() land on 2047 (+1 = 2048) — identical to the reference's numpy
    # computation (projects/neuralangelo/utils/modules.py:51-54).
    assert res[0] == 33 and res[-1] in (2048, 2049) and len(res) == 16
    # dense-until-it-fits structure
    sizes = spec.table_sizes
    assert sizes[0] == 33**3
    assert sizes[-1] == 2**22


def test_encode_shapes():
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_params(key, SMALL)
    pts = jax.random.uniform(key, (5, 7, 3), minval=-1, maxval=1)
    out = hashgrid.encode(table, pts, SMALL)
    assert out.shape == (5, 7, SMALL.output_dim)


def test_encode_exact_at_grid_nodes():
    """At an exact grid node of a dense level the output equals the stored
    feature for that node (trilinear weights collapse to one corner)."""
    spec = hashgrid.HashGridSpec(
        num_levels=1, features_per_level=2, log2_hashmap_size=14, min_logres=2, max_logres=2,
        range_min=0.0, range_max=1.0,
    )
    res = spec.resolutions[0]
    table = (jnp.arange(spec.total_entries * 2, dtype=jnp.float32).reshape(-1, 2),)
    # node (i,j,k) = (1,2,3) -> x01 = (1,2,3)/(res-1)
    x = jnp.asarray([[1.0, 2.0, 3.0]]) / (res - 1)
    out = hashgrid.encode(table, x, spec)
    flat = 1 + res * (2 + res * 3)
    np.testing.assert_allclose(out[0], table[0][flat], atol=1e-5)


def test_encode_trilinear_midpoint():
    spec = hashgrid.HashGridSpec(
        num_levels=1, features_per_level=1, log2_hashmap_size=14, min_logres=2, max_logres=2,
        range_min=0.0, range_max=1.0,
    )
    res = spec.resolutions[0]
    key = jax.random.PRNGKey(1)
    table = (jax.random.normal(key, (spec.total_entries, 1)),)
    # midpoint of cell (0,0,0): average of its 8 corner features
    x = jnp.asarray([[0.5, 0.5, 0.5]]) / (res - 1)
    out = hashgrid.encode(table, x, spec)
    corners = [i + res * (j + res * k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    expect = np.mean([float(table[0][c, 0]) for c in corners])
    np.testing.assert_allclose(float(out[0, 0]), expect, atol=1e-5)


def test_level_mask():
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_params(key, SMALL, scale=1.0)
    pts = jax.random.uniform(key, (10, 3), minval=-1, maxval=1)
    mask = hashgrid.active_levels_to_mask(2, SMALL.num_levels)
    out = hashgrid.encode(table, pts, SMALL, level_mask=mask)
    F = SMALL.features_per_level
    assert np.any(np.asarray(out[:, : 2 * F]) != 0)
    np.testing.assert_allclose(out[:, 2 * F :], 0.0)


def test_gradients_flow_to_table():
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_params(key, SMALL)
    pts = jax.random.uniform(key, (16, 3), minval=-0.9, maxval=0.9)

    def loss(tb):
        return jnp.sum(hashgrid.encode(tb, pts, SMALL) ** 2)

    g = jax.grad(loss)(table)
    assert len(g) == len(table)
    for gl, tl in zip(g, table):
        assert gl.shape == tl.shape
        assert np.isfinite(np.asarray(gl)).all()
    assert sum(float(jnp.sum(jnp.abs(gl))) for gl in g) > 0


def test_gradients_wrt_points():
    """Trilinear interpolation is piecewise-linear in x -> finite differences
    must match autodiff away from cell boundaries."""
    spec = SMALL
    key = jax.random.PRNGKey(3)
    table = hashgrid.init_params(key, spec, scale=1.0)
    pt = jnp.asarray([[0.123, -0.271, 0.456]])

    def f(p):
        return jnp.sum(hashgrid.encode(table, p, spec))

    g = jax.grad(f)(pt)
    eps = 1e-4
    for d in range(3):
        dp = jnp.zeros_like(pt).at[0, d].set(eps)
        fd = (f(pt + dp) - f(pt - dp)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, d]), float(fd), rtol=2e-2, atol=1e-3)


def test_encode_jit_and_points_outside_range_clamp():
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_params(key, SMALL)
    enc = jax.jit(lambda t, p: hashgrid.encode(t, p, SMALL))
    out = enc(table, jnp.asarray([[5.0, -9.0, 0.0]]))  # far outside range
    assert np.isfinite(np.asarray(out)).all()
