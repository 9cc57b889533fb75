"""Volume rendering math (pure JAX).

Counterpart of the reference compositing stack
(``projects/nerf/utils/render.py``). Accumulations run in float32 regardless
of compute dtype — the reference disables autocast around the transmittance
cumprod for the same stability reason (render.py:96-97); on TPU we simply
pin the dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def volume_rendering_weights_dist(densities, dists, dist_far=None):
    """NeRF quadrature weights from densities at distance samples.

    Args:
        densities: [...,N] predicted volume densities.
        dists: [...,N,1] distances along the (unit) ray.
        dist_far: [...,1,1] optional far distance for the last interval.
    Returns:
        weights: [...,N,1] in [0,1].
    """
    if dist_far is None:
        dist_far = jnp.full_like(dists[..., :1, :], 1e10)
    dists = jnp.concatenate([dists, dist_far], axis=-2)  # [...,N+1,1]
    dist_intvs = dists[..., 1:, 0] - dists[..., :-1, 0]  # [...,N]
    sigma_delta = (densities * dist_intvs).astype(jnp.float32)
    sigma_delta_0 = jnp.concatenate(
        [jnp.zeros_like(sigma_delta[..., :1]), sigma_delta[..., :-1]], axis=-1
    )
    T = jnp.exp(-jnp.cumsum(sigma_delta_0, axis=-1))
    alphas = 1 - jnp.exp(-sigma_delta)
    return (T * alphas)[..., None]


def volume_rendering_alphas_dist(densities, dists, dist_far=None):
    """Per-sample opacity values from densities (alphas only, no weights)."""
    if dist_far is None:
        dist_far = jnp.full_like(dists[..., :1, :], 1e10)
    dists = jnp.concatenate([dists, dist_far], axis=-2)
    dist_intvs = dists[..., 1:, 0] - dists[..., :-1, 0]
    sigma_delta = densities * dist_intvs
    return 1 - jnp.exp(-sigma_delta)


def alpha_compositing_weights(alphas):
    """Front-to-back alpha compositing: w_i = a_i * prod_{j<i}(1-a_j).

    Transmittance accumulates in fp32 (see module docstring).
    """
    alphas32 = alphas.astype(jnp.float32)
    alphas_front = jnp.concatenate(
        [jnp.zeros_like(alphas32[..., :1]), alphas32[..., :-1]], axis=-1
    )
    visibility = jnp.cumprod(1 - alphas_front, axis=-1)
    return (alphas32 * visibility)[..., None]


def composite(quantities, weights):
    """Weighted sum over the samples axis: [...,N,K],[...,N,1] -> [...,K]."""
    return jnp.sum(quantities * weights, axis=-2)


def composite_opacity(weights):
    """Total rendered opacity: sum of weights. [...,N,1] -> [...,1]."""
    return jnp.sum(weights, axis=-2)


def get_inverse_depth(depth, opacity=None, camera_ndc=False, eps=1e-10):
    if opacity is not None:
        return (1 - depth) / opacity if camera_ndc else 1 / (depth / opacity + eps)
    return (1 - depth) if camera_ndc else 1 / (depth + eps)
