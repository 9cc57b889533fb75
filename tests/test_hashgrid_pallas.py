"""Correctness of the Pallas scatter-accumulate kernel (interpret mode on
CPU) against XLA's ``.at[].add`` — the table-gradient path of the hash-grid
backward (ops/hashgrid_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.ops import hashgrid_pallas as hp


def test_scatter_add_rows_matches_xla():
    rng = np.random.default_rng(0)
    S, F, N = 4096, 8, 20000  # N not a multiple of CHUNK -> exercises padding
    idx = jnp.asarray(rng.integers(0, S, N), jnp.int32)
    vals = jnp.asarray(rng.normal(0, 1, (N, F)), jnp.float32)
    got = hp.scatter_add_rows(idx, vals, S)
    want = jnp.zeros((S, F), jnp.float32).at[idx].add(vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5)


def test_scatter_add_rows_drops_oob():
    S, F = 256, 8
    idx = jnp.asarray([0, 5, S, S + 7, 5], jnp.int32)  # two OOB rows dropped
    vals = jnp.ones((5, F), jnp.float32)
    got = np.asarray(hp.scatter_add_rows(idx, vals, S))
    assert got[0, 0] == 1.0 and got[5, 0] == 2.0
    assert got.sum() == 3 * F


def test_scatter_add_rows_unaligned_table():
    """Dense low levels have sizes like (res+1)^3 = 729 — not multiples of
    the 128/F pack factor; the padded accumulator must trim exactly."""
    rng = np.random.default_rng(3)
    S, F, N = 729, 8, 5000
    idx = jnp.asarray(rng.integers(0, S, N), jnp.int32)
    vals = jnp.asarray(rng.normal(0, 1, (N, F)), jnp.float32)
    got = hp.scatter_add_rows(idx, vals, S)
    assert got.shape == (S, F)
    want = jnp.zeros((S, F), jnp.float32).at[idx].add(vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5)


def test_take_rows_grad_matches_take():
    rng = np.random.default_rng(1)
    S, F, N = 512, 8, 3000
    table = jnp.asarray(rng.normal(0, 1, (S, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (N,)), jnp.int32)
    cot = jnp.asarray(rng.normal(0, 1, (N, F)), jnp.float32)

    def loss_kernel(t):
        return jnp.sum(hp.take_rows(t, idx) * cot)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, idx, axis=0) * cot)

    np.testing.assert_allclose(np.asarray(loss_kernel(table)), np.asarray(loss_ref(table)), rtol=1e-6)
    g0 = jax.grad(loss_kernel)(table)
    g1 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-5)


def test_take_rows_bf16_table():
    """bf16 tables (the production dtype): forward matches take; the grad is
    accumulated in f32 then cast (strictly better than bf16 accumulation)."""
    rng = np.random.default_rng(2)
    S, F, N = 256, 8, 1000
    table = jnp.asarray(rng.normal(0, 1, (S, F)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, S, (N,)), jnp.int32)

    out = hp.take_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(jnp.take(table, idx, axis=0), np.float32))
    g = jax.grad(lambda t: jnp.sum(hp.take_rows(t, idx).astype(jnp.float32)))(table)
    assert g.dtype == jnp.bfloat16
