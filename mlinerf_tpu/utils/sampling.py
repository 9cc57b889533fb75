"""Ray/sample distance generation (pure JAX, static shapes).

Counterpart of the reference sampling stack
(``projects/nerf/utils/nerf_util.py:20-68``) plus the NeuS hierarchical
importance sampler (``projects/neuralangelo/model.py:449-490``). All shapes
are static; randomness flows through explicit ``jax.random`` keys so the whole
sampler can live inside a jitted train step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mlinerf_tpu.utils import render


def sample_dists(ray_shape, dist_range, intvs: int, stratified: bool, key=None):
    """Sample `intvs` distances per ray, stratified or midpoints.

    Args:
        ray_shape: leading shape, e.g. (B, R).
        dist_range: (near, far) scalars or arrays broadcastable to [...,1,1].
        intvs: number of samples per ray (static).
        stratified: jitter within each interval (requires `key`).
    Returns:
        dists [..., intvs, 1].
    """
    dist_min, dist_max = dist_range
    shape = (*ray_shape, intvs, 1)
    if stratified:
        rands = jax.random.uniform(key, shape, jnp.float32)
    else:
        rands = jnp.full(shape, 0.5, jnp.float32)
    rands = rands + jnp.arange(intvs, dtype=jnp.float32)[None, None, :, None]
    dist_min = jnp.asarray(dist_min, jnp.float32)
    dist_max = jnp.asarray(dist_max, jnp.float32)
    return rands / intvs * (dist_max - dist_min) + dist_min


def searchsorted_batched(sorted_seq, values):
    """Batched ``searchsorted(..., side='right')``.

    ``jnp.searchsorted`` only accepts 1-D bins; for the [B,R,N]-shaped CDFs
    here a broadcast-compare + sum is cheap VPU work (N*Nf comparisons per
    ray) and fuses with the surrounding gather math.

    Args:
        sorted_seq: [..., N] ascending values.
        values: [..., M] query values.
    Returns:
        [..., M] int32 insertion indices in {0..N}.
    """
    return jnp.sum(
        (sorted_seq[..., :, None] <= values[..., None, :]).astype(jnp.int32), axis=-2
    )


def sample_dists_from_pdf(bins, weights, intvs_fine: int, eps=1e-8):
    """Inverse-CDF sampling of fine distances from coarse weights.

    Args:
        bins: [...,N,1] coarse bin distances.
        weights: [...,N] (or [...,N-1]) unnormalized weights; the CDF is built
            over ``weights`` and samples interpolate between bin edges.
        intvs_fine: number of fine samples (static).
    Returns:
        dists_fine [..., intvs_fine, 1].
    """
    pdf = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), eps, None)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [...,N+1]
    grid = jnp.linspace(0, 1, intvs_fine + 1)
    unif = 0.5 * (grid[:-1] + grid[1:])  # [Nf]
    unif = jnp.broadcast_to(unif, (*cdf.shape[:-1], intvs_fine))
    idx = searchsorted_batched(cdf, unif)  # in {1..N}
    low = jnp.clip(idx - 1, 0, None)
    high = jnp.clip(idx, None, cdf.shape[-1] - 1)
    bins_flat = bins[..., 0]
    dist_min = jnp.take_along_axis(bins_flat, jnp.clip(low, None, bins_flat.shape[-1] - 1), axis=-1)
    dist_max = jnp.take_along_axis(bins_flat, jnp.clip(high, None, bins_flat.shape[-1] - 1), axis=-1)
    cdf_low = jnp.take_along_axis(cdf, low, axis=-1)
    cdf_high = jnp.take_along_axis(cdf, high, axis=-1)
    t = (unif - cdf_low) / (cdf_high - cdf_low + eps)
    dists = dist_min + t * (dist_max - dist_min)
    return dists[..., None]


def neus_pdf_weights(dists, sdfs, inv_s, robust: bool = True, eps=1e-5):
    """Section-wise NeuS alphas for hierarchical resampling.

    Mirrors the estimator used by the reference's
    ``sample_dists_hierarchical`` (projects/neuralangelo/model.py:467-484):
    linearized SDF within each section, CDF ratio alphas, optional robust
    min-with-previous slope.

    Args:
        dists: [...,N,1], sdfs: [...,N] (sdf values at dists).
    Returns:
        weights [...,N-1] for PDF resampling.
    """
    prev_sdfs, next_sdfs = sdfs[..., :-1], sdfs[..., 1:]
    prev_dists, next_dists = dists[..., :-1, 0], dists[..., 1:, 0]
    mid_sdfs = 0.5 * (prev_sdfs + next_sdfs)
    cos_val = (next_sdfs - prev_sdfs) / (next_dists - prev_dists + 1e-5)
    if robust:
        prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[..., :1]), cos_val[..., :-1]], axis=-1)
        cos_val = jnp.minimum(prev_cos, cos_val)
    dist_intvs = next_dists - prev_dists
    est_prev = mid_sdfs - cos_val * dist_intvs * 0.5
    est_next = mid_sdfs + cos_val * dist_intvs * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alphas = jnp.clip((prev_cdf - next_cdf) / (prev_cdf + eps), 0.0, 1.0)
    weights = render.alpha_compositing_weights(alphas)  # [...,N-1,1]
    return weights[..., 0]


def sample_dists_background(ray_shape, far, intvs: int, stratified: bool, key=None, eps=1e-5):
    """Inverse-distance sampling beyond `far` (background NeRF samples)."""
    inv_dists = sample_dists(ray_shape, (1.0, 0.0), intvs, stratified, key)
    return far[..., None] / (inv_dists + eps)


def random_ray_indices(key, batch_size: int, num_pixels: int, num_rays: int):
    """Sample `num_rays` distinct pixel indices per batch element.

    TPU-native equivalent of the host-side ``torch.randperm(H*W)[:R]``
    (projects/neuralangelo/data.py:85): rank pixels by random keys. Runs
    on-device under jit.
    """
    r = jax.random.uniform(key, (batch_size, num_pixels))
    return jnp.argsort(r, axis=1)[:, :num_rays]


def slice_by_ray_idx(var, ray_idx):
    """Gather [B,HW,...] by per-batch ray indices [B,R] -> [B,R,...]."""
    return jnp.take_along_axis(
        var, ray_idx.reshape(*ray_idx.shape, *([1] * (var.ndim - 2))), axis=1
    )
