"""Occupancy grid for sample placement (opt-in, Instant-NGP-inspired).

The reference marches a fixed 64+4x16 sample budget per ray regardless of
emptiness. On TPU every sample costs hash gathers AND gradient scatters (the
measured bottleneck, PERF.md), so concentrating the fixed budget inside
occupied space is the highest-leverage optimization that keeps static shapes:

  * a small dense grid (default 64^3, ~1 MB) marks cells whose |SDF| is below
    a band around the surface; it is re-evaluated from the SDF every
    ``update_every`` steps (one cheap 262k-point field eval);
  * at sampling time, each ray marches ``march_bins`` fixed bins through the
    grid (nearest-cell lookups into the cache-resident grid) and draws its
    coarse samples by inverse-CDF from the occupancy profile (floored so
    empty space keeps a small exploration mass).

Enable with ``model.render.occupancy.enabled`` — default off (reference-exact
uniform coarse sampling).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.utils import sampling as samp


def grid_coordinates(resolution: int, range_min: float, range_max: float):
    """Cell-center world coordinates of the occupancy lattice [R^3, 3]."""
    centers = (np.arange(resolution) + 0.5) / resolution
    xs = range_min + centers * (range_max - range_min)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)


def occupancy_from_sdf(sdf_values, resolution: int, range_min: float, range_max: float,
                       band_cells: float = 3.0):
    """Occupancy = |sdf| < band (in cell units). sdf_values: [R^3]."""
    cell = (range_max - range_min) / resolution
    band = band_cells * cell
    occ = (jnp.abs(sdf_values) < band).astype(jnp.float32)
    return occ.reshape(resolution, resolution, resolution)


def lookup(grid, points, range_min: float, range_max: float):
    """Nearest-cell occupancy lookup. points [...,3] -> [...] float."""
    R = grid.shape[0]
    x01 = (points - range_min) / (range_max - range_min)
    idx = jnp.clip((x01 * R).astype(jnp.int32), 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    return jnp.take(grid.reshape(-1), flat.reshape(-1)).reshape(points.shape[:-1])


def occupancy_coarse_dists(grid, center, ray_unit, near, far, intvs: int,
                           range_min: float, range_max: float,
                           march_bins: int = 128, floor: float = 0.02,
                           stratified: bool = False, key=None):
    """Coarse distances distributed along the ray's occupancy profile.

    Args:
        grid: [R,R,R] float occupancy.
        center/ray_unit: [B,Rr,3]; near/far [B,Rr,1].
    Returns:
        dists [B,Rr,intvs,1], sorted ascending.
    """
    # Fixed march bins spanning [near, far].
    t = (jnp.arange(march_bins, dtype=jnp.float32) + 0.5) / march_bins  # [M]
    d = near * (1 - t[None, None, :]) + far * t[None, None, :]  # [B,Rr,M]
    # Component-wise lookup indices: materializing [B,Rr,M,3] march points
    # would tile-pad the trailing 3 on TPU (see ops/hashgrid.py).
    R = grid.shape[0]
    scale = R / (range_max - range_min)
    flat = jnp.zeros(d.shape, jnp.int32)
    for c in range(3):
        p_c = center[..., c : c + 1] + ray_unit[..., c : c + 1] * d  # [B,Rr,M]
        i_c = jnp.clip(((p_c - range_min) * scale).astype(jnp.int32), 0, R - 1)
        flat = flat * R + i_c
    occ = jnp.take(grid.reshape(-1), flat.reshape(-1)).reshape(d.shape)
    weights = occ + floor
    # Bin edges for inverse-CDF: use the march-bin boundaries.
    te = jnp.arange(march_bins + 1, dtype=jnp.float32) / march_bins
    edges = near[..., None] * (1 - te[None, None, :, None]) + far[..., None] * te[None, None, :, None]
    edges = edges[..., 0]  # [B,Rr,M+1]
    dists = samp.sample_dists_from_pdf(edges[..., None], weights, intvs)  # [B,Rr,intvs,1]
    if stratified and key is not None:
        # jitter within the local spacing to avoid banding
        jitter = (jax.random.uniform(key, dists.shape) - 0.5)
        spacing = (far[..., None] - near[..., None]) / march_bins
        dists = jnp.clip(dists + jitter * spacing, near[..., None], far[..., None])
    return jnp.sort(dists, axis=-2)
