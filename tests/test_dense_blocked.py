"""Blocked-corner storage for DENSE hash-grid levels (ops/hashgrid).

The blocked path must be EXACT: forward bitwise-equal to the plain 8-row
take (same rows, same einsum, only the gather indexing changes) and
gradients equal up to float summation order. It also supersedes the
corner-SAMPLED estimator on dense levels (fewer rows and exact), so with
both enabled the dense-level table gradient must match the EXACT gradient,
not the estimator's draw.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.ops import hashgrid


def _mixed_spec():
    # resolutions 5/9/17 (vertex counts) with 2^10=1024 entries: level 0
    # dense (125), level 1 dense (729), level 2 hashed (4913 > 1024).
    return hashgrid.HashGridSpec(num_levels=3, features_per_level=2,
                                 log2_hashmap_size=10, min_logres=2, max_logres=4)


def _setup(seed=0, n=23):
    spec = _mixed_spec()
    table = hashgrid.init_params(jax.random.PRNGKey(seed), spec)
    table = tuple(t.astype(jnp.float32) for t in table)
    pts = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3),
                             minval=-1.9, maxval=1.9)
    return spec, table, pts


def test_blocked_table_layout():
    spec, table, _ = _setup()
    r = spec.resolutions[0]
    corners = hashgrid._corner_indices(spec)
    blocked = hashgrid._blocked_dense_table(table[0], r, corners)
    m = r - 1
    assert blocked.shape == (m**3, 8 * spec.features_per_level)
    # Spot-check cell (1, 2, 0) corner (dx=1, dy=0, dz=1) -> corner index
    # 1*4 + 0*2 + 1 = 5; vertex (2, 2, 1) -> flat 2 + r*(2 + r*1).
    cid = 1 + m * (2 + m * 0)
    vid = 2 + r * (2 + r * 1)
    got = np.asarray(blocked).reshape(m**3, 8, -1)[cid, 5]
    np.testing.assert_array_equal(got, np.asarray(table[0])[vid])


def test_encode_blocked_forward_bitwise():
    spec, table, pts = _setup()
    out_plain = hashgrid.encode(table, pts, spec)
    out_blocked = hashgrid.encode(table, pts, spec, dense_blocked=True)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_blocked))


def test_encode_blocked_gradients_match_exact():
    spec, table, pts = _setup()

    def loss(t, **kw):
        return jnp.sum(jnp.sin(hashgrid.encode(t, pts, spec, **kw)))

    g_plain = jax.grad(loss)(table)
    g_blocked = jax.grad(lambda t: loss(t, dense_blocked=True))(table)
    for a, b in zip(g_plain, g_blocked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_encode_stencil_blocked_forward_and_grads():
    spec, table, pts = _setup(n=13)
    offsets = jnp.asarray([[1, -1, -1], [-1, -1, 1], [-1, 1, -1], [1, 1, 1]],
                          jnp.float32) * 1e-2
    for shared in (0, 2):  # exact branch and shared branch
        out_plain = hashgrid.encode_stencil(table, pts, offsets, spec,
                                            shared_levels=shared)
        out_blocked = hashgrid.encode_stencil(table, pts, offsets, spec,
                                              shared_levels=shared,
                                              dense_blocked=True)
        np.testing.assert_array_equal(np.asarray(out_plain),
                                      np.asarray(out_blocked))

        def loss(t, **kw):
            return jnp.sum(jnp.sin(hashgrid.encode_stencil(
                t, pts, offsets, spec, shared_levels=shared, **kw)))

        g_plain = jax.grad(loss)(table)
        g_blocked = jax.grad(lambda t: loss(t, dense_blocked=True))(table)
        for a, b in zip(g_plain, g_blocked):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_blocked_supersedes_corner_sampling_on_dense_levels():
    spec, table, pts = _setup()
    key = jax.random.PRNGKey(7)

    def loss(t, **kw):
        return jnp.sum(jnp.sin(hashgrid.encode(t, pts, spec, **kw)))

    g_exact = jax.grad(loss)(table)
    g_both = jax.grad(
        lambda t: loss(t, dense_blocked=True, corner_key=key))(table)
    # Dense levels (0, 1): exact gradients even under corner sampling.
    for lv in (0, 1):
        np.testing.assert_allclose(np.asarray(g_exact[lv]),
                                   np.asarray(g_both[lv]),
                                   rtol=1e-5, atol=1e-6)
    # The hashed level still goes through the estimator: same shape, finite.
    assert g_both[2].shape == g_exact[2].shape
    assert bool(jnp.all(jnp.isfinite(g_both[2])))
