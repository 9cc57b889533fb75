"""Ray-volume intersection and surface localization (pure JAX).

Counterpart of ``intersect_with_sphere`` (projects/nerf/utils/nerf_util.py:199),
``intersect_aabb`` (projects/NeuralLumen/utils/utils.py:86-123) and the
L-Tracing-style sphere tracer (projects/neuralangelo/model.py:298-325). The
sphere tracer is a ``lax.fori_loop`` over a fixed iteration count with mask
updates — XLA-friendly, no data-dependent control flow.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def intersect_with_sphere(center, ray_unit, radius: float = 1.0):
    """Ray-sphere intersection distances (NaN where the ray misses).

    Returns:
        (dist_near, dist_far): [...,1] each.
    """
    ctc = jnp.sum(center * center, axis=-1, keepdims=True)
    ctv = jnp.sum(center * ray_unit, axis=-1, keepdims=True)
    b2_minus_4ac = ctv**2 - (ctc - radius**2)
    sq = jnp.sqrt(b2_minus_4ac)  # NaN when negative, matching the reference.
    return -ctv - sq, -ctv + sq


def intersect_aabb(origins, directions, aabb, max_bound: float = 1e10):
    """Slab-test ray/AABB intersection.

    Args:
        aabb: [6] = [x_min,y_min,z_min,x_max,y_max,z_max].
    Returns:
        (t_min [...,1], t_max [...,1], outside [...,1] bool).
    """
    aabb = jnp.asarray(aabb, jnp.float32)
    tx_min = (aabb[:3] - origins) / directions
    tx_max = (aabb[3:] - origins) / directions
    t_min = jnp.minimum(tx_min, tx_max)
    t_max = jnp.maximum(tx_min, tx_max)
    t_min = jnp.max(t_min, axis=-1, keepdims=True)
    t_max = jnp.min(t_max, axis=-1, keepdims=True)
    t_min = jnp.clip(t_min, 0, max_bound)
    t_max = jnp.clip(t_max, 0, max_bound)
    outside = t_max <= t_min
    return t_min, t_max, outside


def dist_bounds_sphere(center, ray_unit, radius: float = 1.0,
                       dummy_near: float = 1.0, dummy_far: float = 1.2):
    """Near/far distances against a bounding sphere with outside handling.

    Rays missing the sphere get dummy (near, far) = (1, 1.2) and an
    ``outside`` flag so downstream sets their density to ~0 — same contract
    as the reference's ``get_dist_bounds`` (projects/neuralangelo/model.py:420).
    """
    near, far = intersect_with_sphere(center, ray_unit, radius=radius)
    near = jnp.maximum(near, 0.0)
    outside = jnp.isnan(near)
    near = jnp.where(outside, dummy_near, near)
    far = jnp.where(outside, dummy_far, far)
    return near, far, outside


def dist_bounds_aabb(center, ray_unit, aabb, dummy_near: float = 1.0, dummy_far: float = 1.2):
    near, far, outside = intersect_aabb(center, ray_unit, aabb)
    near = jnp.where(outside, dummy_near, near)
    far = jnp.where(outside, dummy_far, far)
    return near, far, outside


def sphere_tracing_intersection(
    sdf_fn: Callable,
    center,
    ray_unit,
    near,
    far,
    num_iters: int = 20,
    dist_start=None,
):
    """Fixed-iteration sphere tracing with range masking (L-Tracing variant).

    Marches ``dist += sdf`` while ``near <= dist <= far``; the mask latches
    off permanently once a ray leaves the valid range — mirroring the
    reference semantics (projects/neuralangelo/model.py:298-325) where
    ``mask`` is only ever set to False.

    Args:
        sdf_fn: points [...,3] -> sdf [...,1].
    Returns:
        (dist [...,1], pts [...,3], mask [...,1] bool — True where the trace
        stayed inside [near, far], i.e. converged onto a surface).
    """
    dist0 = dist_start if dist_start is not None else near
    mask0 = jnp.ones_like(dist0, dtype=bool)

    def body(_, state):
        dist, mask = state
        pts = center + ray_unit * dist
        sdfs = sdf_fn(pts)
        dist = jnp.where(mask, dist + sdfs, dist)
        mask = mask & (dist <= far) & (dist >= near)
        return dist, mask

    dist, mask = jax.lax.fori_loop(0, num_iters, body, (dist0, mask0))
    dist = jnp.clip(dist, near, far)
    pts = center + ray_unit * dist
    return dist, pts, mask


def contract(x, r_in: float = 1.0, r_out: float = 2.0, eps: float = 1e-8):
    """mip-NeRF 360 scene contraction (eq 10)."""
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    scale = r_out - r_in * (r_out - r_in) / (x_norm + eps)
    x_unit = x / (x_norm + eps)
    x_contract = scale * x_unit
    return jnp.where(x_norm <= r_in, x, x_contract)
