"""Golden tests for renderer math: NeuS alphas, numerical gradients,
geometric init, LumenRGB head modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.config import StaticConfig
from mlinerf_tpu.models import fields
from mlinerf_tpu.models.mlp import MLPforNeuralSDF


def test_numerical_gradients_linear_sdf_taps4():
    """On a linear SDF f(x) = a.x + b the 4-tap tetrahedral estimate is exact
    and the hessian vanishes."""
    a = jnp.asarray([0.3, -0.7, 0.2])
    pts = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    eps = 0.01
    offs = fields.numerical_gradient_taps(4, eps)  # [4,3]
    pts_tap = pts[:, None, :] + offs
    sdf_taps = pts_tap @ a  # [5,4]
    sdf_center = (pts @ a)[:, None]
    grad, hess = fields.numerical_gradients(sdf_taps, sdf_center, 4, eps, training=True)
    np.testing.assert_allclose(grad, np.broadcast_to(a, (5, 3)), atol=1e-4)
    np.testing.assert_allclose(hess, 0.0, atol=1e-2)


def test_numerical_gradients_taps6_quadratic():
    """On f(x) = ||x||^2: grad = 2x, hessian diag = 2."""
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    # Central second differences are exact for quadratics at any step; a
    # larger eps avoids fp32 cancellation in (f+ + f- - 2f)/eps^2.
    eps = 0.05
    offs = fields.numerical_gradient_taps(6, eps)
    pts_tap = pts[:, None, :] + offs
    sdf_taps = jnp.sum(pts_tap**2, axis=-1)
    sdf_center = jnp.sum(pts**2, axis=-1, keepdims=True)
    grad, hess = fields.numerical_gradients(sdf_taps, sdf_center, 6, eps, training=True)
    np.testing.assert_allclose(grad, 2 * np.asarray(pts), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(hess, 2.0, rtol=2e-2)


def test_geometric_init_approximates_sphere():
    """Geometric init biases the SDF toward ||x|| - out_bias."""
    mlp = MLPforNeuralSDF(
        layer_dims=(3, 256, 256), activ=lambda x: jax.nn.softplus(x * 100) / 100,
        geometric_init=True, out_bias=0.5, use_weightnorm=False,
    )
    pts = jax.random.normal(jax.random.PRNGKey(2), (2000, 3)) * 0.8
    params = mlp.init(jax.random.PRNGKey(3), pts)
    sdf, _ = mlp.apply(params, pts)
    sdf = np.asarray(sdf)[:, 0]
    expect = np.linalg.norm(np.asarray(pts), axis=-1) - 0.5
    # correlation must be strongly positive and the zero level near r=0.5
    corr = np.corrcoef(sdf, expect)[0, 1]
    assert corr > 0.95, corr
    # points near radius 0.5 should have small |sdf|
    near = np.abs(np.linalg.norm(np.asarray(pts), axis=-1) - 0.5) < 0.02
    if near.sum() > 10:
        assert np.abs(sdf[near]).mean() < 0.15


def _neus_alphas_reference(sdfs, iter_cos, dists, dist_far, inv_s, eps=1e-5):
    """Literal transcription of the NeuS CDF-ratio estimator for testing."""
    dists_aug = np.concatenate([dists, dist_far], axis=-2)
    dist_intvs = dists_aug[..., 1:, 0] - dists_aug[..., :-1, 0]
    est_prev = sdfs - iter_cos * dist_intvs * 0.5
    est_next = sdfs + iter_cos * dist_intvs * 0.5
    prev_cdf = 1 / (1 + np.exp(-est_prev * inv_s))
    next_cdf = 1 / (1 + np.exp(-est_next * inv_s))
    return np.clip((prev_cdf - next_cdf) / (prev_cdf + eps), 0, 1)


def test_neus_alpha_surface_crossing():
    """A ray crossing the zero level front-to-back must produce a strong alpha
    at the crossing and ~0 elsewhere."""
    # SDF decreasing linearly along the ray: surface at t=1.0.
    dists = np.linspace(0.5, 1.5, 11)[None, None, :, None].astype(np.float32)
    sdfs = (1.0 - dists[..., 0]).astype(np.float32)  # positive before, negative after
    iter_cos = np.full_like(sdfs, -1.0)
    alphas = _neus_alphas_reference(sdfs, iter_cos, dists, np.full((1, 1, 1, 1), 1e10, np.float32), inv_s=64.0)
    total_opacity = 1 - np.prod(1 - alphas)
    assert total_opacity > 0.99
    # Compositing weight mass must concentrate at the crossing (transmittance
    # extinguishes later samples even though their raw alphas are high).
    from mlinerf_tpu.utils import render

    w = np.asarray(render.alpha_compositing_weights(jnp.asarray(alphas)))[0, 0, :, 0]
    peak = np.argmax(w)
    assert 3 <= peak <= 7, (peak, w)
    assert w[peak] > 0.3


def test_lumen_rgb_modes_shapes():
    cfg = StaticConfig({
        "mlp": {"num_layers": 2, "hidden_dim": 32, "skip": [], "activ": "relu_",
                "activ_params": {}, "weight_norm": True},
        "mode": "idr",
        "encoding_view": {"type": "spherical", "levels": 3},
        "network_mode": None,
        "shading_dim": 1,
    })
    appear = StaticConfig({"enabled": False, "dim": 8})
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (2, 7, 3))
    n = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    feats = jax.random.normal(key, (2, 7, 16))
    light = jnp.ones((2, 7, 3)) / np.sqrt(3)

    def build(mode, shading_dim=1):
        d = dict(cfg._data)
        d["network_mode"] = mode
        d["shading_dim"] = shading_dim
        return fields.LumenRGB(StaticConfig(d), feat_dim=16, appear_embed=appear)

    for mode, n_out in [("r_s", 2), ("r_s_re", 3), ("rgb_r", 2), ("rgb_r_s", 3), (None, 1)]:
        m = build(mode)
        params = m.init(key, p, n, n, feats, light)
        out = m.apply(params, p, n, n, feats, light)
        if mode is None:
            assert out.shape == (2, 7, 3)
        else:
            assert len(out) == n_out
            assert out[0].shape == (2, 7, 3)
            if mode == "rgb_r_s":
                assert out[2].shape == (2, 7, 1)  # shading_dim=1
            # sigmoid heads bounded
            for o in (out if mode != "r_s" else out[:1]):
                assert float(jnp.min(o)) >= 0.0 and float(jnp.max(o)) <= 1.0


def test_iter_cos_annealing_limits():
    """get_iter_cos: at progress 0 uses the shifted-halved form; at/after
    anneal_end equals -relu(-cos) (reference model.py:511-515)."""
    from mlinerf_tpu.models.neuralangelo import get_iter_cos

    true_cos = jnp.asarray([-0.5, 0.5])
    out0 = np.asarray(get_iter_cos(true_cos, jnp.asarray(0.0), anneal_end=0.1))
    out1 = np.asarray(get_iter_cos(true_cos, jnp.asarray(1.0), anneal_end=0.1))
    # progress 0: -relu(-c*0.5+0.5) -> c=-0.5: -(0.75); c=0.5: -(0.25)
    np.testing.assert_allclose(out0, [-0.75, -0.25], atol=1e-6)
    # fully annealed: -relu(-c) -> c=-0.5: -0.5; c=0.5: 0
    np.testing.assert_allclose(out1, [-0.5, 0.0], atol=1e-6)
    # always non-positive
    assert (out0 <= 0).all() and (out1 <= 0).all()


def test_clamp_with_gradient_reference_semantics():
    """CustomClamp parity (NeuralLumen/utils/modules.py:268-299): forward
    clamps; backward passes cotangent inside the range, constant 1 outside."""
    from mlinerf_tpu.utils.misc import clamp_with_gradient

    x = jnp.asarray([-0.5, 0.25, 0.75, 1.5])
    y, vjp = jax.vjp(lambda v: clamp_with_gradient(v, 0.0, 1.0), x)
    np.testing.assert_allclose(y, [0.0, 0.25, 0.75, 1.0])
    (gx,) = vjp(jnp.asarray([10.0, 10.0, 10.0, 10.0]))
    np.testing.assert_allclose(gx, [1.0, 10.0, 10.0, 1.0])
