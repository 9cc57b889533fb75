"""Fused Pallas MLP: forward/backward equivalence with plain XLA (interpret
mode on CPU; the compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.ops import fused_mlp


def make_net(key, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1])) * 0.1)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.01)
    return ws, bs


def plain_mlp(x, ws, bs, act, final_activation=False):
    h = x
    for li in range(len(ws)):
        h = h @ ws[li] + bs[li]
        if li != len(ws) - 1 or final_activation:
            h = act(h)
    return h


@pytest.mark.parametrize("P", [512, 777])  # aligned and ragged row counts
def test_forward_matches_plain(P):
    key = jax.random.PRNGKey(0)
    ws, bs = make_net(key, [128, 256, 256, 128])
    x = jax.random.normal(key, (P, 128))
    out = fused_mlp.fused_mlp(x, ws, bs, activation="relu", interpret=True)
    expect = plain_mlp(x, ws, bs, jax.nn.relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_softplus100_activation():
    key = jax.random.PRNGKey(1)
    ws, bs = make_net(key, [128, 256, 128])
    x = jax.random.normal(key, (256, 128))
    out = fused_mlp.fused_mlp(x, ws, bs, activation="softplus100", interpret=True)
    act = lambda z: jax.nn.softplus(z * 100.0) / 100.0
    expect = plain_mlp(x, ws, bs, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5)


def test_gradients_match_plain():
    key = jax.random.PRNGKey(2)
    ws, bs = make_net(key, [128, 256, 128])
    x = jax.random.normal(key, (512, 128))

    def loss_fused(x, ws, bs):
        return jnp.sum(fused_mlp.fused_mlp(x, ws, bs, activation="relu", interpret=True) ** 2)

    def loss_plain(x, ws, bs):
        return jnp.sum(plain_mlp(x, ws, bs, jax.nn.relu) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, tuple(ws), tuple(bs))
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, tuple(ws), tuple(bs))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
